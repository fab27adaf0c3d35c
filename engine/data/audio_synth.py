"""Deterministic synthetic audio corpus (no external data, no RNG state).

Every cell is a closed-form function of the clip index, chosen so a DuckDB
oracle over ``range()`` can reproduce the REAL decode output bit-for-bit
(round-2 VERDICT item 1a — the rng-based clips table cannot be SQL-modeled,
so the oracle-able audio corpus gets its own generator, exactly as
engine/data/images.py did for image_dims):

  sr        cycles {8000, 16000, 22050, 44100} by i % 4
  dur_ms    200 + (i*37) % 800              (floor division for n_samples —
            round() would hit banker's-vs-half-away disagreements)
  codec     by i % 7: pcm16, pcm8, opus, flac, pcm16, mp3 (no decoder),
            pcm16-truncated (payload cut mid-data-chunk)
  signal    an alternating-sign square wave whose levels are chosen AT the
            PCM quantization grid, so encode→decode round-trips exactly:
              pcm16-family: target integer k = 8000 + (i%50)*300,
                            sample value = float32(k / 32767)
              pcm8:         target byte  p = 160 + (i%60),
                            sample value = float32((2p - 255) / 255)
            The decoded float32 values are then pure functions of k / p that
            DuckDB reproduces with CAST(... AS REAL) (k/32767 and p/255 are
            never float32 midpoints — 32767 and 255 are non-dyadic), so
            rms and zero-cross-rate hash-match the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.audio import encode_audio

SRS = (8000, 16000, 22050, 44100)
CODEC_CASES = ("pcm16", "pcm8", "opus", "flac", "pcm16", "mp3", "pcm16")


def audio_params(i: int) -> dict:
    """Closed-form parameters for clip i (the contract the SQL oracle models)."""
    case = i % 7
    sr = SRS[i % 4]
    dur_ms = 200 + (i * 37) % 800
    return {
        "case": case,
        "codec": CODEC_CASES[case],
        "truncated": case == 6,
        "sr": sr,
        "dur_ms": dur_ms,
        "n_samples": sr * dur_ms // 1000,
        "k16": 8000 + (i % 50) * 300,
        "p8": 160 + (i % 60),
    }


def synth_audio(i: int) -> tuple[bytes, str]:
    """(payload bytes, codec tag) for clip i."""
    p = audio_params(i)
    n = p["n_samples"]
    if p["codec"] == "pcm8":
        v = np.float32((2 * p["p8"] - 255) / 255)
        v_neg = np.float32((255 - 2 * p["p8"]) / 255)
    else:
        v = np.float32(p["k16"] / 32767)
        v_neg = np.float32(-p["k16"] / 32767)
    sig = np.empty(n, dtype=np.float32)
    sig[0::2] = v
    sig[1::2] = v_neg
    # flac rows get REAL FLAC bytes (engine/flac.py): lossless over the
    # quantization-grid signal, so the pcm16-branch SQL oracle still holds.
    enc_codec = p["codec"] if p["codec"] in ("pcm16", "pcm8", "opus", "flac") else "pcm16"
    raw = encode_audio(sig, p["sr"], enc_codec)
    if p["truncated"]:
        raw = raw[: max(10, len(raw) // 3)]
    return raw, p["codec"]


def synth_g711(i: int) -> tuple[bytes, str]:
    """(payload bytes, codec tag) for G.711 clip i: an alternating-sign
    square wave expressed DIRECTLY as companded bytes.  Byte b decodes to
    value v via the public G.711 bit layout and b ^ 0x80 decodes to exactly
    -v (the sign bit flips through both the mu-law complement and the A-law
    0x55 mask), so rms = |v|/32767 and zero-cross-rate = 1 are closed-form
    in the byte index — SQL-oracle-able like the PCM corpus above."""
    from engine.audio import _wav_container

    codec = "ulaw" if i % 2 == 0 else "alaw"
    sr = SRS[i % 4]
    dur_ms = 200 + (i * 37) % 800
    n = sr * dur_ms // 1000
    b = 16 + (i % 96)
    pattern = np.empty(n, dtype=np.uint8)
    pattern[0::2] = b
    pattern[1::2] = b ^ 0x80
    return _wav_container(pattern.tobytes(), sr, 8,
                          7 if codec == "ulaw" else 6), codec


def synth_g711_batch(batch: pa.Table) -> pa.Table:
    """ray.data.range(n) batch → (aud_id, bytes, codec) G.711 rows."""
    ids = batch.column("id").to_numpy()
    blobs, codecs = [], []
    for i in ids:
        raw, codec = synth_g711(int(i))
        blobs.append(raw)
        codecs.append(codec)
    return pa.table({
        "aud_id": pa.array(ids.astype(np.int64)),
        "bytes": pa.array(blobs, pa.large_binary()),
        "codec": pa.array(codecs, pa.string()),
    })


def synth_adpcm(i: int) -> tuple[bytes, str]:
    """(payload bytes, codec tag) for IMA-ADPCM clip i: a crafted nibble
    stream whose decode is closed-form.  Every block header carries
    (predictor P, step index 0); the nibbles alternate magnitude m and
    m|8 (same magnitude, opposite sign).  For m < 4 the IMA index table
    entry is -1, so the index stays clamped at 0 and the step stays 7
    forever — the decoded samples are exactly P, P+d, P, P+d, ... with
    d = vpdiff(m, step=7) ∈ {1: 1, 2: 3, 3: 4}.  rms/zcr are then pure
    integer closed forms of i that DuckDB recomputes (ADPCM's sequential
    state machine is otherwise not SQL-expressible), exactly the G.711
    crafted-byte trick above.  Clips with i % 5 == 4 get a fact-chunk trim
    (n < whole blocks) to exercise the partial-final-block path."""
    from engine.audio import _WAVE_FMT_IMA_ADPCM

    ba = 32 + 4 * (i % 8)                    # block_align 32..60 bytes
    spb = 2 * (ba - 4) + 1
    nb = 2 + (i % 3)
    t = (1 + (i % 7)) if i % 5 == 4 else 0   # samples trimmed by fact
    n = nb * spb - t
    m = 1 + (i % 3)                          # nibble magnitude 1..3
    sign = 1 if i % 2 == 0 else -1
    p = sign * (10 + (i * 37) % 20000)
    sr = SRS[i % 4]
    block = bytearray(ba)
    block[0] = p & 0xFF
    block[1] = (p >> 8) & 0xFF
    block[2] = 0                             # step index 0 (clamped forever)
    lo, hi = m, m | 8                        # +d then -d
    for j in range(4, ba):
        block[j] = lo | (hi << 4)
    data = bytes(block) * nb
    byte_rate = max(1, sr * ba // spb)
    fmt = (
        _WAVE_FMT_IMA_ADPCM.to_bytes(2, "little") + (1).to_bytes(2, "little")
        + sr.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
        + ba.to_bytes(2, "little") + (4).to_bytes(2, "little")
        + (2).to_bytes(2, "little") + spb.to_bytes(2, "little"))
    fact = b"fact" + (4).to_bytes(4, "little") + n.to_bytes(4, "little")
    body = (b"fmt " + len(fmt).to_bytes(4, "little") + fmt + fact
            + b"data" + len(data).to_bytes(4, "little") + data)
    return (b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE"
            + body), "adpcm"


def synth_adpcm_batch(batch: pa.Table) -> pa.Table:
    """ray.data.range(n) batch → (aud_id, bytes, codec) IMA-ADPCM rows."""
    ids = batch.column("id").to_numpy()
    blobs, codecs = [], []
    for i in ids:
        raw, codec = synth_adpcm(int(i))
        blobs.append(raw)
        codecs.append(codec)
    return pa.table({
        "aud_id": pa.array(ids.astype(np.int64)),
        "bytes": pa.array(blobs, pa.large_binary()),
        "codec": pa.array(codecs, pa.string()),
    })


def synth_flac(i: int) -> tuple[bytes, str]:
    """(payload bytes, codec tag) for REAL-FLAC clip i.  Three signal
    classes by i % 3 — constant (CONSTANT subframe), small-amplitude
    alternating ±v (FIXED order + Rice residuals: small v keeps the Rice
    cost under 16 bits/sample so the encoder picks FIXED), period-4 square
    at large v (Rice loses to raw 16-bit there, so the encoder picks
    VERBATIM) — all two-valued on the int16 grid, so the LOSSLESS decode
    is the exact input and rms/zcr are closed-form in i for the DuckDB
    oracle, while the three classes pin all three subframe kinds."""
    from engine.flac import encode_flac

    c = i % 3
    sr = SRS[i % 4]
    dur_ms = 100 + (i * 37) % 400
    n = sr * dur_ms // 1000
    v = (40 + (i % 50) * 7) if c == 1 else 5000 + (i % 60) * 400
    if c == 0:
        pcm = np.full(n, v, dtype=np.int16)
    elif c == 1:
        pcm = np.empty(n, dtype=np.int16)
        pcm[0::2] = v
        pcm[1::2] = -v
    else:
        pcm = np.tile(np.array([v, v, -v, -v], dtype=np.int16),
                      n // 4 + 1)[:n]
    return encode_flac(pcm, sr), "flac"


def synth_flac_batch(batch: pa.Table) -> pa.Table:
    """ray.data.range(n) batch → (aud_id, bytes, codec) real-FLAC rows."""
    ids = batch.column("id").to_numpy()
    blobs, codecs = [], []
    for i in ids:
        raw, codec = synth_flac(int(i))
        blobs.append(raw)
        codecs.append(codec)
    return pa.table({
        "aud_id": pa.array(ids.astype(np.int64)),
        "bytes": pa.array(blobs, pa.large_binary()),
        "codec": pa.array(codecs, pa.string()),
    })


def synth_trim(i: int) -> tuple[bytes, str]:
    """(payload bytes, codec tag) for silence-trim clip i: exact-zero
    leading/trailing pads around an alternating ±v core, so lead/trail/
    kept and kept_rms are closed-form in i.  Every i % 7 == 6 clip is
    all-silence (whole length counts as leading, by the documented
    convention); every i % 4 == 3 clip rides the REAL FLAC path."""
    from engine.audio import encode_audio

    sr = SRS[i % 4]
    codec = "flac" if i % 4 == 3 else "pcm16"
    if i % 7 == 6:
        n = 500 + (i % 300)
        sig = np.zeros(n, dtype=np.float32)
    else:
        p = (i * 7) % 500
        q = (i * 11) % 300
        core = 400 + (i * 37) % 2000
        v = 1000 + (i % 50) * 300
        mid = np.empty(core, dtype=np.float32)
        mid[0::2] = np.float32(v / 32767)
        mid[1::2] = np.float32(-v / 32767)
        sig = np.concatenate([np.zeros(p, np.float32), mid,
                              np.zeros(q, np.float32)])
    return encode_audio(sig, sr, codec), codec


def synth_trim_batch(batch: pa.Table) -> pa.Table:
    """ray.data.range(n) batch → (aud_id, bytes, codec) trim-corpus rows."""
    ids = batch.column("id").to_numpy()
    blobs, codecs = [], []
    for i in ids:
        raw, codec = synth_trim(int(i))
        blobs.append(raw)
        codecs.append(codec)
    return pa.table({
        "aud_id": pa.array(ids.astype(np.int64)),
        "bytes": pa.array(blobs, pa.large_binary()),
        "codec": pa.array(codecs, pa.string()),
    })


def synth_tone(i: int) -> tuple[bytes, str]:
    """(payload bytes, codec tag) for pure-tone clip i: a sine whose
    frequency sits EXACTLY on FFT bin k = 3 + i % 60 of a 256-point frame
    (f = k * sr / 256), so the dominant spectral bin of any windowed
    power spectrum is k in closed form — the spectrogram oracle."""
    from engine.audio import encode_audio

    sr = SRS[i % 4]
    dur_ms = 150 + (i * 37) % 500
    n = sr * dur_ms // 1000
    k = 3 + (i % 60)
    phase = 2.0 * np.pi * k / 256.0
    sig = (0.5 * np.sin(phase * np.arange(n, dtype=np.float64))) \
        .astype(np.float32)
    return encode_audio(sig, sr, "pcm16"), "pcm16"


def synth_tone_batch(batch: pa.Table) -> pa.Table:
    """ray.data.range(n) batch → (aud_id, bytes, codec) pure-tone rows."""
    ids = batch.column("id").to_numpy()
    blobs, codecs = [], []
    for i in ids:
        raw, codec = synth_tone(int(i))
        blobs.append(raw)
        codecs.append(codec)
    return pa.table({
        "aud_id": pa.array(ids.astype(np.int64)),
        "bytes": pa.array(blobs, pa.large_binary()),
        "codec": pa.array(codecs, pa.string()),
    })


def synth_audio_batch(batch: pa.Table) -> pa.Table:
    """ray.data.range(n) batch → (aud_id, bytes, codec) rows."""
    ids = batch.column("id").to_numpy()
    blobs, codecs = [], []
    for i in ids:
        raw, codec = synth_audio(int(i))
        blobs.append(raw)
        codecs.append(codec)
    return pa.table({
        "aud_id": pa.array(ids.astype(np.int64)),
        "bytes": pa.array(blobs, pa.large_binary()),
        "codec": pa.array(codecs, pa.string()),
    })


def synth_flac_stereo(i: int) -> tuple[bytes, str]:
    """(payload bytes, codec tag) for STEREO real-FLAC clip i.  Four signal
    classes by i % 4, each constructed so one RFC 9639 decorrelation mode
    is strictly cheapest (the oracle pins the chosen assignment nibble):

      0  R == L            -> left/side  (side == 0, constant)
      1  R == -L           -> mid/side   (mid == 0, constant; side = 2L)
      2  L = bb +/- a, R = bb (constant) -> right/side (R is near-free)
      3  L = +/-p, R anti-phase +/-q with p >> q -> independent
         (side amplitude p+q costs more than either channel)

    All two-valued per channel on the int16 grid -> lossless decode makes
    per-channel RMS a closed form of i for the DuckDB oracle."""
    from engine.flac import encode_flac

    c = i % 4
    sr = SRS[i % 4]
    dur_ms = 100 + (i * 37) % 400
    n = sr * dur_ms // 1000
    a = 40 + (i % 50) * 7
    bb = 500 + (i % 40) * 9
    p = 2000 + (i % 30) * 50
    q = 50 + (i % 20) * 3
    alt = np.empty(n, dtype=np.int64)
    alt[0::2], alt[1::2] = 1, -1
    if c == 0:
        left = a * alt
        right = left.copy()
    elif c == 1:
        left = a * alt
        right = -left
    elif c == 2:
        left = bb + a * alt
        right = np.full(n, bb, dtype=np.int64)
    else:
        left = p * alt
        right = -q * alt                        # anti-phase vs left
    pcm = np.stack([left, right], axis=1).astype(np.int16)
    return encode_flac(pcm, sr), "flac"


def synth_flac_stereo_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("id").to_numpy()
    blobs, codecs = [], []
    for i in ids:
        raw, codec = synth_flac_stereo(int(i))
        blobs.append(raw)
        codecs.append(codec)
    return pa.table({
        "aud_id": pa.array(ids.astype(np.int64)),
        "bytes": pa.array(blobs, pa.large_binary()),
        "codec": pa.array(codecs, pa.string()),
    })
