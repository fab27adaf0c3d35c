"""WAV codec + SNR invariant."""

import numpy as np
import pytest

from engine.audio import (
    AudioDecodeError,
    check_clip_audio,
    decode_any,
    decode_wav,
    encode_wav,
    reference_signal,
    snr_db,
)


def test_pcm16_roundtrip_high_snr():
    sig = reference_signal("clip-x", 16000, 8000)
    raw = encode_wav(sig, 16000, "pcm16")
    decoded, sr = decode_wav(raw)
    assert sr == 16000 and decoded.size == 8000
    assert snr_db(sig, decoded) > 60


def test_pcm8_roundtrip_moderate_snr():
    sig = reference_signal("clip-y", 8000, 4000)
    raw = encode_wav(sig, 8000, "pcm8")
    decoded, sr = decode_wav(raw)
    assert 30 < snr_db(sig, decoded) < 60


def test_stub_codec_path():
    sig = reference_signal("clip-z", 8000, 1000)
    raw = encode_wav(sig, 8000, "opus")   # wav payload tagged opus
    decoded, sr = decode_any(raw, "opus")
    assert sr == 8000 and decoded.size == 1000
    with pytest.raises(NotImplementedError):
        decode_any(raw, "mp3")


def test_g711_tables_match_reference_and_roundtrip():
    """The computed mu-law/A-law expansion tables must be byte-identical to
    the classic CCITT reference (stdlib audioop — an independent public
    implementation), every decoded codeword must survive an
    encode(decode(b)) round trip, and companding a sine must land in the
    G.711 ballpark (~35-40 dB SNR)."""
    import warnings

    from engine.audio import (_ALAW_DECODE, _ULAW_DECODE, _g711_encode,
                              decode_any)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop
    ref_u = np.frombuffer(audioop.ulaw2lin(bytes(range(256)), 2), dtype="<i2")
    ref_a = np.frombuffer(audioop.alaw2lin(bytes(range(256)), 2), dtype="<i2")
    assert (_ULAW_DECODE == ref_u).all()
    assert (_ALAW_DECODE == ref_a).all()

    for table in (_ULAW_DECODE, _ALAW_DECODE):
        enc = _g711_encode(table.astype(np.int16), table)
        assert (table[enc] == table).all()

    sig = reference_signal("clip-g711", 8000, 8000)
    for codec in ("ulaw", "alaw"):
        raw = encode_wav(sig, 8000, codec)
        decoded, sr = decode_any(raw, codec)
        assert sr == 8000 and decoded.size == 8000
        assert 30 < snr_db(sig, decoded) < 60

    # sign-flip property used by the oracle corpus: b ^ 0x80 negates
    b = np.arange(256, dtype=np.int64)
    assert (_ULAW_DECODE[b ^ 0x80] == -_ULAW_DECODE[b]).all()
    assert (_ALAW_DECODE[b ^ 0x80] == -_ALAW_DECODE[b]).all()


def test_decode_rejects_garbage():
    with pytest.raises(AudioDecodeError):
        decode_wav(b"not audio at all")
    with pytest.raises(AudioDecodeError):
        decode_wav(b"RIFF....WAVE" + b"\0" * 40)


def test_check_clip_audio_verdicts():
    cid, sr, dur = "clip-ok", 16000, 500
    n = sr * dur // 1000
    good = encode_wav(reference_signal(cid, sr, n), sr, "pcm16")
    v = check_clip_audio(cid, good, sr, dur, "pcm16")
    assert v["audio_ok"] and v["snr_db"] > 30

    noise = encode_wav(np.random.default_rng(0).normal(0, 0.3, n).astype(np.float32), sr, "pcm16")
    v = check_clip_audio(cid, noise, sr, dur, "pcm16")
    assert not v["audio_ok"] and "low_snr" in v["audio_error"]

    v = check_clip_audio(cid, good[:30], sr, dur, "pcm16")
    assert not v["audio_ok"] and "decode" in v["audio_error"]

    v = check_clip_audio(cid, good, sr, dur + 100, "pcm16")
    assert not v["audio_ok"] and "duration_mismatch" in v["audio_error"]


# ------------------------------------------------------------------ IMA ADPCM


def test_ima_adpcm_core_matches_audioop():
    """The IMA nibble state machine must be byte-identical to stdlib
    audioop.adpcm2lin (an independent public Intel/DVI implementation;
    audioop consumes the HIGH nibble of each byte first, the WAV block
    layout the LOW — the comparison feeds both the same nibble SEQUENCE)."""
    audioop = pytest.importorskip("audioop")
    from engine.audio import ima_decode_nibbles

    rng = np.random.default_rng(1234)
    for trial in range(5):
        n = int(rng.integers(10, 2000)) * 2
        nibs = rng.integers(0, 16, size=n, dtype=np.uint8)
        packed = ((nibs[0::2] << 4) | nibs[1::2]).astype(np.uint8).tobytes()
        with np.errstate(all="ignore"):
            frag, _state = audioop.adpcm2lin(packed, 2, (0, 0))
        ref = np.frombuffer(frag, dtype=np.int16)
        mine = ima_decode_nibbles(
            nibs.reshape(1, -1), np.array([0]), np.array([0]))[0]
        assert np.array_equal(ref, mine)


def test_ima_adpcm_roundtrip_snr_and_layout():
    from engine.audio import encode_adpcm

    t = np.arange(16000, dtype=np.float64) / 16000
    sig = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 555 * t)
    pcm = np.round(sig * 32767).astype(np.int16)
    raw = encode_adpcm(pcm, 16000, block_align=256)
    dec, sr = decode_wav(raw)
    assert sr == 16000 and dec.size == pcm.size
    # 4-bit ADPCM on a smooth two-tone signal: well above the 30 dB bar.
    assert snr_db(pcm.astype(np.float32) / 32767.0, dec) > 35
    # Block headers carry the exact first sample of each block.
    spb = 2 * (256 - 4) + 1
    dec_i = np.round(dec * 32767.0).astype(np.int32)
    assert int(dec_i[0]) == int(pcm[0])
    assert int(dec_i[spb]) == int(pcm[spb])
    # ~4.06 bits/sample on the wire vs 16 raw.
    assert len(raw) < pcm.size


def test_ima_adpcm_edges_and_errors():
    from engine.audio import encode_adpcm

    for n in (0, 1, 2, 505, 506):
        p = (np.arange(n) % 7 * 100 - 300).astype(np.int16)
        d, _ = decode_wav(encode_adpcm(p, 8000, block_align=32))
        assert d.size == n
        if n:
            assert int(round(float(d[0]) * 32767)) == int(p[0])
    raw = encode_adpcm(np.zeros(100, dtype=np.int16), 8000, block_align=32)
    # Step index byte out of range must be a decode error, not garbage PCM.
    bad = bytearray(raw)
    data_at = raw.index(b"data") + 8
    bad[data_at + 2] = 200
    with pytest.raises(AudioDecodeError):
        decode_wav(bytes(bad))


def test_synth_adpcm_closed_form():
    """The oracle corpus contract: decoded stream is P, P+d, P, ... with the
    step pinned at 7 (engine/data/audio_synth.py:synth_adpcm)."""
    from engine.data.audio_synth import synth_adpcm

    d_of_m = {1: 1, 2: 3, 3: 4}
    for i in (0, 1, 4, 9, 14, 37, 4095):
        raw, codec = synth_adpcm(i)
        sig, _sr = decode_any(raw, codec)
        ba = 32 + 4 * (i % 8)
        spb = 2 * (ba - 4) + 1
        nb = 2 + (i % 3)
        trim = (1 + (i % 7)) if i % 5 == 4 else 0
        n = nb * spb - trim
        sign = 1 if i % 2 == 0 else -1
        p = sign * (10 + (i * 37) % 20000)
        d = d_of_m[1 + (i % 3)]
        assert sig.size == n
        ints = np.round(sig * 32767.0).astype(np.int32)
        expect = np.empty(nb * spb, dtype=np.int32)
        blk = np.full(spb, p)
        blk[1::2] = p + d
        expect[:] = np.tile(blk, nb)
        assert np.array_equal(ints, expect[:n])
