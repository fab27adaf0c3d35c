"""Storage seam: Lance when available, Parquet otherwise.

The north rule targets Lance tables; this sandbox has no ``lance`` package
(SURVEY.md §7.6), so every reader/writer in the engine goes through this seam
and silently uses Parquet.  When lance is installed, the same call sites get
``ray.data.read_lance`` / ``write_lance`` with no other changes.
"""

from __future__ import annotations


def have_lance() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_table(path: str, *, columns=None, **kwargs):
    import ray.data

    if have_lance() and str(path).endswith(".lance"):
        return ray.data.read_lance(path, columns=columns, **kwargs)
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def write_table(ds, path: str, **kwargs) -> None:
    if have_lance() and str(path).endswith(".lance"):
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)


# ------------------------------------------------------- audio shard sink
#
# Binary-payload sink for audio columns: each task packs its batch's clips
# into ONE shard file of concatenated FLAC streams (the WebDataset/tar
# pattern — file count scales with blocks, not clips, which is what a
# 10^12-clip table needs) and emits manifest rows (clip_id, shard, offset,
# length, n_samples, sr_hz) that the caller writes as the index table.
#
# Shard names are a digest of the batch's clip ids, so a re-run of the
# same partition overwrites the same file with the same bytes —
# write-idempotent, which is what makes the partition-manifest resume in
# engine/run.py safe for binary sinks too.


class AudioShardSink:
    """map_batches callable: transcode each clip to FLAC and append it to
    a per-batch shard file under ``out_dir``; returns manifest rows.

    Transcode is exact for every source codec whose decode lands on the
    int16 grid (pcm16, g711, adpcm, flac itself); pcm8 re-quantizes within
    half an int16 LSB.  Undecodable clips become manifest rows with
    shard = NULL and an error string — the violations pattern, never a
    dropped row."""

    def __init__(self, out_dir: str, bytes_col: str = "bytes",
                 id_col: str = "clip_id", codec_col: str = "codec") -> None:
        import os

        self.out_dir = out_dir
        self.bytes_col = bytes_col
        self.id_col = id_col
        self.codec_col = codec_col
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch):
        import hashlib
        import os

        import numpy as np
        import pyarrow as pa

        from engine.audio import AudioDecodeError, decode_any
        from engine.flac import encode_flac

        ids = batch.column(self.id_col).to_pylist()
        blobs = batch.column(self.bytes_col)
        codecs = batch.column(self.codec_col).to_pylist()
        # Digest EVERY clip id: (first, last, count) collides for two
        # batches whose interiors differ after a reshuffle, silently
        # overwriting each other's shard and corrupting earlier offsets.
        digest = hashlib.sha1(
            ("\x1f".join(str(x) for x in ids)).encode()
        ).hexdigest()[:16] if ids else "empty"
        shard_name = f"shard-{digest}.flacpack"
        shard_path = os.path.join(self.out_dir, shard_name)
        pieces: list[bytes] = []
        offsets = np.zeros(len(ids), dtype=np.int64)
        lengths = np.zeros(len(ids), dtype=np.int64)
        n_samples = np.zeros(len(ids), dtype=np.int64)
        srs = np.zeros(len(ids), dtype=np.int64)
        shards: list[str | None] = []
        errors: list[str | None] = []
        off = 0
        for i in range(len(ids)):
            try:
                sig, sr = decode_any(blobs[i].as_py(), codecs[i])
            except (AudioDecodeError, NotImplementedError) as exc:
                shards.append(None)
                errors.append(f"decode: {exc}")
                continue
            enc = encode_flac(
                np.clip(np.round(sig * 32767.0), -32768, 32767).astype(np.int16),
                int(sr))
            offsets[i] = off
            lengths[i] = len(enc)
            n_samples[i] = sig.size
            srs[i] = int(sr)
            off += len(enc)
            pieces.append(enc)
            shards.append(shard_name)
            errors.append(None)
        tmp = shard_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(b"".join(pieces))
        os.replace(tmp, shard_path)            # write-once-then-rename
        return pa.table({
            "clip_id": pa.array([str(x) for x in ids], pa.string()),
            "shard": pa.array(shards, pa.string()),
            "offset": pa.array(offsets),
            "length": pa.array(lengths),
            "n_samples": pa.array(n_samples),
            "sr_hz": pa.array(srs),
            "error": pa.array(errors, pa.string()),
        })


def read_shard_clip(out_dir: str, shard: str, offset: int, length: int) -> bytes:
    """Fetch one clip's FLAC stream back out of a packed shard."""
    import os

    with open(os.path.join(out_dir, shard), "rb") as f:
        f.seek(offset)
        return f.read(length)


def export_audio_shards(ds, out_dir: str, *, batch_size: int = 256,
                        concurrency=(1, 8), **cols):
    """clips Dataset → packed FLAC shards + manifest Dataset (caller
    writes the manifest with write_table — parquet here, Lance when the
    seam has it)."""
    return ds.map_batches(
        AudioShardSink,
        fn_constructor_kwargs={"out_dir": out_dir, **cols},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def read_audio_shards(manifest_ds, shards_dir: str, *, batch_size: int = 256,
                      concurrency: int | None = None):
    """Manifest Dataset → (clip_id, bytes, codec='flac', sr_hz, n_samples)
    clips Dataset — the SOURCE matching AudioShardSink: each task opens
    its batch's shard files once (manifest rows from one shard are
    adjacent, so a batch touches few files) and slices the packed FLAC
    streams back out.  Error rows (shard IS NULL) are dropped — they never
    made it into a shard."""

    def fetch(batch, _dir=shards_dir):
        import os

        import numpy as np
        import pyarrow as pa

        shards_dir = _dir
        shards = batch.column("shard").to_pylist()
        offs = batch.column("offset").to_numpy(zero_copy_only=False)
        lens = batch.column("length").to_numpy(zero_copy_only=False)
        ids = batch.column("clip_id").to_pylist()
        srs = batch.column("sr_hz").to_numpy(zero_copy_only=False)
        nsamp = batch.column("n_samples").to_numpy(zero_copy_only=False)
        out_ids, out_bytes, out_sr, out_n = [], [], [], []
        handles: dict[str, object] = {}
        try:
            for i, sh in enumerate(shards):
                if sh is None:
                    continue
                f = handles.get(sh)
                if f is None:
                    f = handles[sh] = open(os.path.join(shards_dir, sh), "rb")
                f.seek(int(offs[i]))
                out_bytes.append(f.read(int(lens[i])))
                out_ids.append(ids[i])
                out_sr.append(int(srs[i]))
                out_n.append(int(nsamp[i]))
        finally:
            for f in handles.values():
                f.close()
        return pa.table({
            "clip_id": pa.array(out_ids, pa.string()),
            "bytes": pa.array(out_bytes, pa.large_binary()),
            "codec": pa.array(["flac"] * len(out_ids), pa.string()),
            "sr_hz": pa.array(np.asarray(out_sr, dtype=np.int32)),
            "n_samples": pa.array(np.asarray(out_n, dtype=np.int64)),
        })

    return manifest_ds.map_batches(fetch, batch_format="pyarrow",
                                   batch_size=batch_size,
                                   concurrency=concurrency)
