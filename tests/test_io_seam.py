"""Lance/Parquet storage seam (round-2 VERDICT item 7: the lance branch had
never executed because the package is absent — fake the module so dispatch
and call signatures are covered, and bind our call shapes against the REAL
ray.data lance API signatures so drift is caught)."""

import inspect
import sys
import types

import pyarrow as pa
import pytest


@pytest.fixture()
def fake_lance(monkeypatch):
    """Install a stub ``lance`` module so have_lance() returns True."""
    monkeypatch.setitem(sys.modules, "lance", types.ModuleType("lance"))
    yield


def test_have_lance_flips_with_module(fake_lance):
    from engine.io import have_lance

    assert have_lance() is True


def test_have_lance_false_without_module():
    from engine.io import have_lance

    assert have_lance() is False  # package genuinely absent in this sandbox


def test_read_seam_dispatches_to_lance(fake_lance, monkeypatch, ray_session):
    import ray.data

    from engine import io

    calls = []

    def fake_read_lance(uri, *, columns=None, **kwargs):
        calls.append({"uri": uri, "columns": columns, **kwargs})
        return ray.data.from_arrow(pa.table({"x": pa.array([1, 2])}))

    monkeypatch.setattr(ray.data, "read_lance", fake_read_lance)
    ds = io.read_table("/tmp/t.lance", columns=["x"])
    assert calls == [{"uri": "/tmp/t.lance", "columns": ["x"]}]
    assert ds.count() == 2

    # Non-.lance paths must NOT hit the lance reader even when available.
    calls.clear()
    import pyarrow.parquet as pq
    pq.write_table(pa.table({"y": pa.array([3])}), "/tmp/seam_probe.parquet")
    ds2 = io.read_table("/tmp/seam_probe.parquet", columns=["y"])
    assert calls == []
    assert ds2.count() == 1


def test_write_seam_dispatches_to_lance(fake_lance, monkeypatch, ray_session):
    import ray.data

    from engine import io

    ds = ray.data.from_arrow(pa.table({"x": pa.array([1, 2, 3])}))
    calls = []
    monkeypatch.setattr(
        type(ds), "write_lance",
        lambda self, path, **kw: calls.append({"path": path, **kw}),
        raising=False)
    io.write_table(ds, "/tmp/out.lance", mode="overwrite")
    assert calls == [{"path": "/tmp/out.lance", "mode": "overwrite"}]


def test_seam_call_shapes_bind_to_real_ray_lance_api(ray_session):
    """The seam's exact call shapes must bind to the REAL ray.data lance
    signatures (no fake involved) — catches upstream signature drift the
    moment the pinned Ray version changes, without needing the lance
    package installed."""
    import ray.data

    inspect.signature(ray.data.read_lance).bind(
        "/tmp/t.lance", columns=["x"])            # read_table's call shape
    inspect.signature(ray.data.Dataset.write_lance).bind(
        None, "/tmp/out.lance", mode="overwrite")  # write_table's call shape


def test_audio_shard_sink_roundtrip(ray_session, tmp_path):
    """Packed-FLAC shard sink: transcode clips into per-batch shard files,
    then fetch every clip back by (shard, offset, length) and check the
    decoded PCM is EXACT vs the source decode; undecodable rows become
    error manifest rows, and a re-run overwrites the same shard bytes
    (idempotent resume)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from engine.audio import decode_any, encode_audio
    from engine.io import export_audio_shards, read_shard_clip

    rng = np.random.default_rng(9)
    rows = {"clip_id": [], "bytes": [], "codec": []}
    for i in range(40):
        codec = ["pcm16", "flac", "ulaw", "adpcm"][i % 4]
        sig = (0.4 * np.sin(np.arange(1200) / (8 + i))).astype(np.float32)
        rows["clip_id"].append(f"c{i:04d}")
        rows["bytes"].append(encode_audio(sig, 8000, codec))
        rows["codec"].append(codec)
    rows["clip_id"].append("junk")
    rows["bytes"].append(b"notaudio")
    rows["codec"].append("pcm16")
    t = pa.table({"clip_id": pa.array(rows["clip_id"], pa.string()),
                  "bytes": pa.array(rows["bytes"], pa.large_binary()),
                  "codec": pa.array(rows["codec"], pa.string())})
    out_dir = str(tmp_path / "shards")
    ds = ray.data.from_arrow(t)
    manifest = export_audio_shards(ds, out_dir).to_pandas()
    assert len(manifest) == 41
    bad = manifest[manifest["error"].notna()]
    assert bad["clip_id"].tolist() == ["junk"] and bad["shard"].isna().all()
    ok = manifest[manifest["error"].isna()]
    for _, r in ok.iterrows():
        enc = read_shard_clip(out_dir, r["shard"], int(r["offset"]),
                              int(r["length"]))
        sig, sr = decode_any(enc, "flac")
        i = int(r["clip_id"][1:])
        src_sig, src_sr = decode_any(rows["bytes"][i], rows["codec"][i])
        assert sr == src_sr and sig.size == src_sig.size == int(r["n_samples"])
        # transcode is exact on the int16 grid for all four source codecs
        assert np.array_equal(np.round(sig * 32767.0),
                              np.round(src_sig * 32767.0))
    # idempotent re-run: same shard names, same bytes
    import hashlib
    import os
    before = {f: hashlib.sha1(open(os.path.join(out_dir, f), "rb").read()).hexdigest()
              for f in os.listdir(out_dir)}
    export_audio_shards(ds, out_dir).materialize()
    after = {f: hashlib.sha1(open(os.path.join(out_dir, f), "rb").read()).hexdigest()
             for f in os.listdir(out_dir)}
    assert before == after


def test_audio_shard_source_roundtrip(ray_session, tmp_path):
    """Sink → source round trip as Datasets: every clip read back through
    read_audio_shards decodes to the same PCM; error rows are dropped."""
    import numpy as np
    import pyarrow as pa
    import ray

    from engine.audio import decode_any, encode_audio
    from engine.io import export_audio_shards, read_audio_shards

    sigs = {f"r{i}": (0.3 * np.sin(np.arange(900) / (5 + i))).astype(np.float32)
            for i in range(12)}
    t = pa.table({
        "clip_id": pa.array(list(sigs) + ["bad"], pa.string()),
        "bytes": pa.array([encode_audio(s, 16000, "pcm16")
                           for s in sigs.values()] + [b"x"], pa.large_binary()),
        "codec": pa.array(["pcm16"] * 12 + ["pcm16"], pa.string()),
    })
    out_dir = str(tmp_path / "packs")
    manifest = export_audio_shards(ray.data.from_arrow(t), out_dir)
    clips = read_audio_shards(manifest, out_dir).to_pandas()
    assert sorted(clips["clip_id"]) == sorted(sigs)
    for _, r in clips.iterrows():
        sig, sr = decode_any(r["bytes"], r["codec"])
        assert sr == 16000 and sig.size == int(r["n_samples"])
        want = np.round(sigs[r["clip_id"]] * 32767.0)
        assert np.array_equal(np.round(sig * 32767.0), want)
