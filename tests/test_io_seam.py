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
