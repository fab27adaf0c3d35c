"""Baseline JPEG codec (engine/jpeg.py) — round-trip quality, exact
DC-only reconstruction anchors, container robustness, dispatch.

There is no JPEG library in this environment to differential-test against,
so correctness rests on (a) closed-form DC-only exactness for constant
images, (b) PSNR bounds on smooth gradients at every supported mode, and
(c) strict container-level failure on unsupported variants — the same
strategy the audio codecs use (SNR invariant + byte-exact anchors)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.image import ImageDecodeError, decode_image, sniff_format
from engine.jpeg import (Q_LUM, decode_jpeg, encode_jpeg, jpeg_info,
                         scaled_quant_table, _DCT_M)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return float("inf") if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _gradient(h: int, w: int, phase: int = 0) -> np.ndarray:
    """Triangular-wave gradient: smooth, no 255->0 sawtooth edge."""
    y, x = np.mgrid[0:h, 0:w]
    return np.abs(((x + 2 * y + phase) % 510) - 255).astype(np.uint8)


def _rgb(h: int, w: int, phase: int = 0) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    r = np.abs(((x + 2 * y + phase) % 510) - 255)
    g = np.abs(((2 * x + y + phase) % 510) - 255)
    b = np.abs(((x + y + 2 * phase + 37) % 510) - 255)
    return np.stack([r, g, b], axis=2).astype(np.uint8)


# ------------------------------------------------------------ exact anchors


@pytest.mark.parametrize("quality", [50, 85, 95, 100])
@pytest.mark.parametrize("v", [0, 1, 7, 128, 200, 255])
def test_constant_gray_dc_only_exact(quality, v):
    """A constant image has one nonzero (DC) coefficient; reconstruction
    is a closed form of the scaled quant table — every pixel must equal
    it exactly (float DC mirrors the encoder's own DCT so half-integer
    quantization ties round identically)."""
    img = np.full((16, 24), v, np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=quality))[:, :, 0]
    qdc = int(scaled_quant_table(Q_LUM, quality)[0])
    block = np.full((8, 8), float(v) - 128.0)
    f00 = (_DCT_M @ block @ _DCT_M.T)[0, 0]
    dcq = float(np.rint(f00 / qdc))
    exp = int(np.clip(np.rint(dcq * qdc / 8.0 + 128.0), 0, 255))
    assert dec.shape == (16, 24)
    assert (dec == exp).all()


def test_constant_rgb_is_near_exact():
    img = np.full((17, 15, 3), 0, np.uint8)
    img[:, :, 0] = 120
    img[:, :, 1] = 80
    img[:, :, 2] = 200
    for sub in ("444", "420"):
        dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
        # constant in -> constant out per channel, within DC quantization
        assert dec.shape == img.shape
        for c in range(3):
            vals = np.unique(dec[:, :, c])
            assert len(vals) == 1
            assert abs(int(vals[0]) - int(img[0, 0, c])) <= 4


# ------------------------------------------------------------- PSNR bounds


@pytest.mark.parametrize("quality,floor", [(50, 40.0), (75, 44.0),
                                           (85, 48.0), (95, 55.0)])
def test_gray_gradient_psnr(quality, floor):
    img = _gradient(37, 53)
    dec = decode_jpeg(encode_jpeg(img, quality=quality))[:, :, 0]
    assert _psnr(img, dec) >= floor


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("restart", [0, 1, 3])
def test_rgb_roundtrip_psnr(sub, restart):
    img = _rgb(37, 53, phase=11)
    data = encode_jpeg(img, quality=85, subsampling=sub,
                       restart_interval=restart)
    dec = decode_jpeg(data)
    assert dec.shape == img.shape
    assert _psnr(img, dec) >= 40.0
    if restart:
        assert b"\xFF\xDD" in data          # DRI present
        assert jpeg_info(data)["restart_interval"] == restart


def test_odd_dims_420_padding():
    img = _rgb(9, 17, phase=3)
    dec = decode_jpeg(encode_jpeg(img, quality=75, subsampling="420"))
    assert dec.shape == (9, 17, 3)
    assert _psnr(img, dec) >= 35.0


def test_noise_survives_all_qualities():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    for q in (1, 25, 85, 100):
        dec = decode_jpeg(encode_jpeg(img, quality=q, subsampling="420"))
        assert dec.shape == img.shape
    # q=100 4:4:4 on noise stays faithful (q tables are all ones)
    dec = decode_jpeg(encode_jpeg(img, quality=100, subsampling="444"))
    assert _psnr(img, dec) >= 40.0


# ------------------------------------------------------ container handling


def test_header_metadata_parse():
    info = jpeg_info(encode_jpeg(_rgb(21, 34), quality=80,
                                 subsampling="420", restart_interval=5))
    assert info["width"] == 34 and info["height"] == 21
    assert info["n_components"] == 3
    assert info["sampling"][0] == (2, 2)
    assert info["sampling"][1] == (1, 1)
    assert info["restart_interval"] == 5


def test_progressive_rejected():
    data = bytearray(encode_jpeg(_gradient(16, 16), quality=80))
    i = bytes(data).find(b"\xFF\xC0")
    data[i + 1] = 0xC2                      # rewrite SOF0 -> SOF2
    with pytest.raises(ImageDecodeError, match="progressive"):
        decode_jpeg(bytes(data))
    with pytest.raises(ImageDecodeError, match="progressive"):
        jpeg_info(bytes(data))


def test_truncated_rejected():
    data = encode_jpeg(_rgb(20, 20), quality=80)
    with pytest.raises(ImageDecodeError):
        decode_jpeg(data[:18])              # cut inside the header
    with pytest.raises(ImageDecodeError):
        decode_jpeg(b"\xFF\xD8\xFF\xE0")


def test_not_a_jpeg():
    with pytest.raises(ImageDecodeError):
        decode_jpeg(b"GIF89a\x00\x00")
    with pytest.raises(ImageDecodeError):
        jpeg_info(b"")


def test_16bit_dqt_precision():
    """Rewrite the 8-bit DQT of a valid file into Pq=1 (16-bit) form; the
    decode must be bit-identical (same table values, wider encoding)."""
    img = _gradient(24, 24)
    data = encode_jpeg(img, quality=85)
    base = decode_jpeg(data)
    i = data.find(b"\xFF\xDB")
    seglen = int.from_bytes(data[i + 2:i + 4], "big")
    body = data[i + 4:i + 2 + seglen]
    assert body[0] == 0x00                  # Pq=0, Tq=0
    wide = bytes([0x10]) + b"".join(
        bytes([0, b]) for b in body[1:65])
    patched = (data[:i + 2]
               + (len(wide) + 2).to_bytes(2, "big") + wide
               + data[i + 2 + seglen:])
    assert np.array_equal(decode_jpeg(patched), base)


def test_dispatch_and_sniff():
    data = encode_jpeg(_rgb(12, 18), quality=85)
    assert sniff_format(data) == "jpeg"
    img, fmt = decode_image(data)
    assert fmt == "jpeg" and img.shape == (12, 18, 3)


def test_encoder_input_validation():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4), np.float32))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4), np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4), np.uint8), subsampling="422")


# ---------------------------------------------------------------- property


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 3), st.data())
def test_roundtrip_any_small_image(nch, data):
    """Any uint8 image decodes to the same geometry and mode; encoding is
    deterministic; grayscale and RGB both survive 4:2:0."""
    h = data.draw(st.integers(1, 21))
    w = data.draw(st.integers(1, 21))
    seed = data.draw(st.integers(0, 2 ** 31 - 1))
    rng = np.random.default_rng(seed)
    if nch == 2:                            # map to gray via (h, w, 1)
        img = rng.integers(0, 256, (h, w, 1), dtype=np.uint8)
        exp_c = 1
    elif nch == 1:
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        exp_c = 1
    else:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        exp_c = 3
    sub = data.draw(st.sampled_from(["444", "420"]))
    q = data.draw(st.integers(1, 100))
    ri = data.draw(st.sampled_from([0, 1, 2]))
    blob = encode_jpeg(img, quality=q, subsampling=sub, restart_interval=ri)
    assert blob == encode_jpeg(img, quality=q, subsampling=sub,
                               restart_interval=ri)
    dec = decode_jpeg(blob)
    assert dec.shape == (h, w, exp_c)


def test_jpeg_check_stage_matches_oracle_facts():
    """Stage-level twin of the jpeg_image_metadata oracle: exact container
    facts per class and the PSNR>=30dB verdict, no Ray session needed."""
    import pyarrow as pa

    from engine.data.images import image_dims, synth_jpeg_batch
    from engine.ops.multimodal import JpegCheckStage

    ids = list(range(32))
    batch = synth_jpeg_batch(pa.table({"id": pa.array(ids, pa.int64())}))
    out = JpegCheckStage()(batch).to_pandas()
    assert out.decode_ok.all()
    for _, row in out.iterrows():
        i = int(row.img_id)
        w, h = image_dims(i)
        assert (row.width, row.height) == (w, h)
        assert row["mode"] == ("L" if i % 4 == 0 else "RGB")
        assert row.subsampling == ("gray", "444", "420", "444")[i % 4]
        assert row.restart_interval == (2 if i % 4 == 3 else 0)


def test_jpeg_check_stage_flags_corrupt_payload():
    import pyarrow as pa

    from engine.data.images import synth_jpeg_batch
    from engine.ops.multimodal import JpegCheckStage

    batch = synth_jpeg_batch(pa.table({"id": pa.array([0, 1], pa.int64())}))
    blobs = batch.column("image").to_pylist()
    blobs[1] = blobs[1][:20]                      # truncate inside header
    bad = pa.table({"img_id": batch.column("img_id"),
                    "image": pa.array(blobs, pa.large_binary())})
    out = JpegCheckStage()(bad).to_pandas()
    assert bool(out.decode_ok[0]) and not bool(out.decode_ok[1])
