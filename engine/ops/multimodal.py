"""Multimodal column operators (binary payloads + typed metadata).

The audio path is fully real (this repo's WAV codecs).  The image path is
real for PPM/PGM/BMP/TGA (pure-numpy codecs, engine/image.py); other image
formats and video decode are STUBBED behind ``NotImplementedError`` — the
codec libraries are not in this container — with the Ray-side plumbing
(schema, actor-pool signature, batch sizing, output layout) real and tested
so swapping in Pillow / PyAV later is a one-class change.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.audio import AudioDecodeError, decode_any


class AudioFeatureStage:
    """bytes+codec → (rms, zero_cross_rate, n_samples, decode_ok).  Real decode."""

    def __init__(self, bytes_col: str = "bytes", codec_col: str = "codec") -> None:
        self.bytes_col = bytes_col
        self.codec_col = codec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.bytes_col)
        codecs = batch.column(self.codec_col).to_pylist()
        n = batch.num_rows
        rms = np.full(n, np.nan)
        zcr = np.full(n, np.nan)
        samples = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                sig, _sr = decode_any(blobs[i].as_py(), codecs[i])
            except (AudioDecodeError, NotImplementedError):
                continue
            ok[i] = True
            samples[i] = sig.size
            if sig.size:
                rms[i] = float(np.sqrt(np.mean(sig.astype(np.float64) ** 2)))
                zcr[i] = float(np.mean(np.signbit(sig[1:]) != np.signbit(sig[:-1])))
        return batch.drop_columns([self.bytes_col]).append_column("rms", pa.array(rms)) \
            .append_column("zero_cross_rate", pa.array(zcr)) \
            .append_column("n_samples", pa.array(samples)) \
            .append_column("decode_ok", pa.array(ok))


class ImageDecodeStage:
    """Binary image column → (width, height, mode, img_format, mean_lum,
    decode_ok) metadata.  REAL decode for PPM/PGM, 24-bit BMP and type-2 TGA
    via the pure-numpy codecs in engine/image.py (round-1 VERDICT item 6).

    Formats outside that set (JPEG/PNG need a codec library absent here):
    with ``fake=True`` they fall back to deterministic payload-derived
    metadata with ``decode_ok=False`` so pipelines keep flowing; with
    ``fake=False`` the unknown format raises, the way a strict pipeline
    would surface a missing codec.
    """

    def __init__(self, bytes_col: str = "image", fake: bool = True) -> None:
        self.bytes_col = bytes_col
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        from engine.image import ImageDecodeError, decode_image

        blobs = batch.column(self.bytes_col)
        n = batch.num_rows
        w = np.zeros(n, dtype=np.int32)
        h = np.zeros(n, dtype=np.int32)
        lum = np.full(n, np.nan)
        ok = np.zeros(n, dtype=bool)
        modes = ["unknown"] * n
        fmts = ["unknown"] * n
        for i in range(n):
            raw = blobs[i].as_py() or b""
            try:
                img, fmt = decode_image(raw)
            except ImageDecodeError:
                if not self.fake:
                    raise NotImplementedError(
                        "unsupported image format; PPM/PGM, 24-bit BMP and "
                        "type-2 TGA decode natively, others need Pillow")
                # Deterministic fallback: dimensions derived from payload digest.
                d = sum(raw[:16]) if raw else 0
                w[i] = 64 + (d % 192)
                h[i] = 64 + ((d * 7) % 192)
                modes[i] = "RGB"
                continue
            ok[i] = True
            h[i], w[i] = img.shape[0], img.shape[1]
            modes[i] = {1: "L", 3: "RGB", 4: "RGBA"}[img.shape[2]]
            lum[i] = float(img[:, :, :3].mean())
            fmts[i] = fmt
        return batch.append_column("width", pa.array(w)) \
            .append_column("height", pa.array(h)) \
            .append_column("mode", pa.array(modes, pa.string())) \
            .append_column("img_format", pa.array(fmts, pa.string())) \
            .append_column("mean_lum", pa.array(lum)) \
            .append_column("decode_ok", pa.array(ok))


class FrameSampleStage:
    """Binary video column → sampled, DECODED frame metadata.

    REAL for the PPMV container (engine/video.py: indexed PPM frames —
    seek-and-decode only the k sampled frames, never a full scan; the shape a
    PyAV-backed stage would keep at petabyte scale).  Other containers
    (mp4/mkv need PyAV, absent here): ``fake=True`` emits length-derived
    offsets with decode_ok=False; ``fake=False`` raises.
    """

    def __init__(self, bytes_col: str = "video", n_frames: int = 4, fake: bool = True) -> None:
        self.bytes_col = bytes_col
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        from engine.video import (VideoDecodeError, decode_frame,
                                  read_ppmv_index, sample_frame_indices)

        blobs = batch.column(self.bytes_col)
        n = batch.num_rows
        offsets: list[list[int]] = []
        lums: list[list[float]] = []
        total_frames = np.zeros(n, dtype=np.int64)
        fps_col = np.zeros(n)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            raw = blobs[i].as_py() or b""
            try:
                nf, fps, offs = read_ppmv_index(raw)
                idx = sample_frame_indices(nf, self.n_frames)
                frames = [decode_frame(raw, offs, int(j)) for j in idx]
            except VideoDecodeError:
                if not self.fake:
                    raise NotImplementedError(
                        "unsupported video container; PPMV decodes natively, "
                        "real codecs need PyAV")
                span = max(len(raw), 1)
                offsets.append([int(j * span / self.n_frames)
                                for j in range(self.n_frames)])
                lums.append([])
                continue
            ok[i] = True
            total_frames[i] = nf
            fps_col[i] = fps
            offsets.append([int(offs[j]) for j in idx])
            lums.append([float(f.mean()) for f in frames])
        return batch.append_column(
            "frame_offsets", pa.array(offsets, pa.list_(pa.int64()))) \
            .append_column("frame_lums", pa.array(lums, pa.list_(pa.float64()))) \
            .append_column("total_frames", pa.array(total_frames)) \
            .append_column("fps", pa.array(fps_col)) \
            .append_column("video_ok", pa.array(ok))
