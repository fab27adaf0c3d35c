"""Minimal deterministic video container ("PPMV") + pure-numpy frame access.

Real video codecs (H.264 etc.) need PyAV, absent in this container.  PPMV is
an honest stand-in that keeps the whole frame-sampling path REAL: a tiny
indexed container of PPM frames, so seek-and-decode-selected-frames — the
actual shape of a frame-sample stage over petabytes of video — is exercised
end to end without decoding every frame.

Layout (little-endian):
    magic   4s   b"PPMV"
    n       u32  frame count
    fps_mhz u32  frame rate in millihertz (fps * 1000)
    offs    u64 * (n+1)   byte offsets of each frame payload (last = EOF)
    frames  concatenated PPM (P5/P6) payloads
"""

from __future__ import annotations

import struct

import numpy as np

from engine.image import ImageDecodeError, decode_pnm, encode_ppm

MAGIC = b"PPMV"
_HDR = struct.Struct("<4sII")


class VideoDecodeError(ValueError):
    pass


def encode_ppmv(frames: list[np.ndarray], fps: float = 10.0) -> bytes:
    payloads = [encode_ppm(f) for f in frames]
    n = len(payloads)
    base = _HDR.size + 8 * (n + 1)
    offs = [base]
    for p in payloads:
        offs.append(offs[-1] + len(p))
    return (_HDR.pack(MAGIC, n, int(round(fps * 1000)))
            + struct.pack(f"<{n + 1}Q", *offs)
            + b"".join(payloads))


def read_ppmv_index(data: bytes) -> tuple[int, float, np.ndarray]:
    """(n_frames, fps, offsets) — header-only parse, no frame decode."""
    if len(data) < _HDR.size or data[:4] != MAGIC:
        raise VideoDecodeError("not a PPMV container")
    _, n, fps_mhz = _HDR.unpack_from(data, 0)
    need = _HDR.size + 8 * (n + 1)
    if len(data) < need:
        raise VideoDecodeError("truncated PPMV index")
    offs = np.frombuffer(data, dtype="<u8", count=n + 1, offset=_HDR.size)
    if offs[-1] > len(data) or (np.diff(offs.astype(np.int64)) < 0).any():
        raise VideoDecodeError("corrupt PPMV index")
    return n, fps_mhz / 1000.0, offs


def decode_frame(data: bytes, offs: np.ndarray, idx: int) -> np.ndarray:
    """Decode ONE frame by index — a seek + bounded read, not a full scan."""
    try:
        return decode_pnm(data[int(offs[idx]):int(offs[idx + 1])])
    except ImageDecodeError as exc:
        raise VideoDecodeError(f"bad frame {idx}: {exc}") from exc


def sample_frame_indices(n_frames: int, k: int) -> np.ndarray:
    """k evenly-spaced frame indices (deterministic; all frames if k >= n)."""
    if n_frames <= 0:
        return np.empty(0, dtype=np.int64)
    k = min(k, n_frames)
    return np.unique((np.arange(k) * n_frames // k).astype(np.int64))
