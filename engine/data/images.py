"""Deterministic synthetic image corpus (no external data, no RNG state).

Each image id maps to a fixed size, format and gradient pattern, so tests
and oracles can predict every decoded value.  Formats cycle through the
natively-decodable set plus an 'unknown' payload that exercises the fake
fallback path of ImageDecodeStage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.image import encode_bmp, encode_ppm, encode_tga

FORMATS = ("ppm", "pgm", "bmp", "tga", "unknown")


def image_dims(i: int) -> tuple[int, int]:
    """(width, height) for image id i — pure function of the id."""
    return 16 + (i * 7) % 49, 16 + (i * 11) % 37


def image_format(i: int) -> str:
    return FORMATS[i % len(FORMATS)]


def synth_image(i: int) -> bytes:
    """Encode image id i in its format; gradient pixels (x + 2y + i) % 256."""
    w, h = image_dims(i)
    y, x = np.mgrid[0:h, 0:w]
    base = ((x + 2 * y + i) % 256).astype(np.uint8)
    fmt = image_format(i)
    if fmt == "pgm":
        return encode_ppm(base)
    rgb = np.stack([base, (base + 85) % 256, (base + 170) % 256], axis=2).astype(np.uint8)
    if fmt == "ppm":
        return encode_ppm(rgb)
    if fmt == "bmp":
        return encode_bmp(rgb)
    if fmt == "tga":
        return encode_tga(rgb)
    # 'unknown': an opaque payload no codec claims (exercises the fallback).
    return b"\x00OPAQ" + bytes([(i * 13 + j) % 256 for j in range(32)])


def synth_image_batch(batch: pa.Table, id_col: str = "id") -> pa.Table:
    ids = batch.column(id_col).to_pylist()
    return pa.table({
        "img_id": pa.array(ids, pa.int64()),
        "image": pa.array([synth_image(int(i)) for i in ids], pa.large_binary()),
    })


PNG_CLASSES = ("gray", "rgb", "palette", "rgba")


def synth_png(i: int) -> bytes:
    """PNG for image id i: gradient v = (x + 2y + i) % 256, color class
    i % 4 (gray / RGB / palette-that-decodes-to-the-RGB-gradient / RGBA
    with an ignored alpha plane), scanline filter i % 5 — the corpus
    exercises every decoder unfilter path and every supported color type."""
    from engine.image import encode_png, encode_png_palette

    w, h = image_dims(i)
    y, x = np.mgrid[0:h, 0:w]
    v = ((x + 2 * y + i) % 256).astype(np.uint8)
    cls = PNG_CLASSES[i % 4]
    f = i % 5
    if cls == "gray":
        return encode_png(v, filter_type=f)
    if cls == "palette":
        # palette[j] = (j, j+85, j+170) mod 256: decodes to the RGB gradient
        j = np.arange(256, dtype=np.uint16)
        pal = np.stack([j % 256, (j + 85) % 256, (j + 170) % 256],
                       axis=1).astype(np.uint8)
        return encode_png_palette(v, pal, filter_type=f)
    rgb = np.stack([v, (v + 85) % 256, (v + 170) % 256], axis=2).astype(np.uint8)
    if cls == "rgb":
        return encode_png(rgb, filter_type=f)
    alpha = ((x + y + i) % 256).astype(np.uint8)       # excluded from mean_lum
    return encode_png(np.concatenate([rgb, alpha[:, :, None]], axis=2),
                      filter_type=f)


def synth_png_batch(batch: pa.Table, id_col: str = "id") -> pa.Table:
    ids = batch.column(id_col).to_pylist()
    return pa.table({
        "img_id": pa.array(ids, pa.int64()),
        "image": pa.array([synth_png(int(i)) for i in ids], pa.large_binary()),
    })


def synth_gif(i: int) -> bytes:
    """GIF for image id i: the palette decodes index v to the SAME RGB
    gradient as the PNG corpus (palette[j] = (j, j+85, j+170) mod 256,
    idx = (x + 2y + i) % 256), every 3rd image carries a transparent index
    (RGBA decode path).  Closed-form mean luminance, SQL-oracle-able."""
    from engine.image import encode_gif

    w, h = image_dims(i)
    y, x = np.mgrid[0:h, 0:w]
    idx = ((x + 2 * y + i) % 256).astype(np.uint8)
    j = np.arange(256, dtype=np.uint16)
    pal = np.stack([j % 256, (j + 85) % 256, (j + 170) % 256],
                   axis=1).astype(np.uint8)
    transparent = 7 if i % 3 == 2 else None
    return encode_gif(idx, pal, transparent=transparent)


def synth_gif_batch(batch: pa.Table, id_col: str = "id") -> pa.Table:
    ids = batch.column(id_col).to_pylist()
    return pa.table({
        "img_id": pa.array(ids, pa.int64()),
        "image": pa.array([synth_gif(int(i)) for i in ids], pa.large_binary()),
    })


def video_frames(i: int) -> int:
    return 3 + i % 6


def video_dims(i: int) -> tuple[int, int]:
    return 16 + (i * 5) % 33, 16 + (i * 3) % 25


def synth_video(i: int) -> bytes:
    """PPMV clip for video id i: gradient frames (x + y + i + 7*f) % 256.

    Every 7th id is an opaque non-PPMV payload exercising the fallback path.
    """
    from engine.video import encode_ppmv

    if i % 7 == 6:
        return b"\x00MP4?" + bytes([(i * 31 + j) % 256 for j in range(64)])
    w, h = video_dims(i)
    y, x = np.mgrid[0:h, 0:w]
    frames = [((x + y + i + 7 * f) % 256).astype(np.uint8)
              for f in range(video_frames(i))]
    return encode_ppmv(frames, fps=5.0 + i % 20)


def synth_video_batch(batch: pa.Table, id_col: str = "id") -> pa.Table:
    ids = batch.column(id_col).to_pylist()
    return pa.table({
        "vid_id": pa.array(ids, pa.int64()),
        "video": pa.array([synth_video(int(i)) for i in ids], pa.large_binary()),
    })


JPEG_CLASSES = ("gray", "rgb444", "rgb420", "rgb444rst")


def jpeg_source(i: int) -> np.ndarray:
    """The pre-compression pixels for JPEG id i: triangular-wave gradients
    (smooth — no 255->0 sawtooth edge, so block-DCT ringing stays tiny and
    the round-trip PSNR invariant holds with margin)."""
    w, h = image_dims(i)
    y, x = np.mgrid[0:h, 0:w]
    r = np.abs(((x + 2 * y + i) % 510) - 255)
    if i % 4 == 0:
        return r.astype(np.uint8)
    g = np.abs(((2 * x + y + i) % 510) - 255)
    b = np.abs(((x + y + 2 * i + 37) % 510) - 255)
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def synth_jpeg(i: int) -> bytes:
    """Baseline JPEG for image id i, class i % 4: grayscale q90 / RGB
    4:4:4 q85 / RGB 4:2:0 q75 / RGB 4:4:4 q85 with restart markers every
    2 MCUs.  Lossy, so the oracle checks the exact container facts
    (dims / mode / subsampling / restart) while the engine-side decode
    check enforces the PSNR >= 30 dB invariant against jpeg_source()."""
    from engine.jpeg import encode_jpeg

    src = jpeg_source(i)
    cls = JPEG_CLASSES[i % 4]
    if cls == "gray":
        return encode_jpeg(src, quality=90)
    if cls == "rgb444":
        return encode_jpeg(src, quality=85, subsampling="444")
    if cls == "rgb420":
        return encode_jpeg(src, quality=75, subsampling="420")
    return encode_jpeg(src, quality=85, subsampling="444",
                       restart_interval=2)


def synth_jpeg_batch(batch: pa.Table, id_col: str = "id") -> pa.Table:
    ids = batch.column(id_col).to_pylist()
    return pa.table({
        "img_id": pa.array(ids, pa.int64()),
        "image": pa.array([synth_jpeg(int(i)) for i in ids],
                          pa.large_binary()),
    })
