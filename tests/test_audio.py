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
