"""Property-based invariants of round-2 components (hypothesis):
image/video codec roundtrips over arbitrary dims/pixels, the batch minhash
equals the per-document reference implementation, duplicate_runs run
detection, and BroadcastMap vs a plain dict.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

dims = st.tuples(st.integers(min_value=1, max_value=40),
                 st.integers(min_value=1, max_value=40))


def _img(w: int, h: int, c: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    return a[:, :, 0] if c == 1 else a


@settings(max_examples=80, deadline=None)
@given(dims, st.sampled_from([1, 3]), st.integers(min_value=0, max_value=2**31))
def test_ppm_roundtrip(wh, c, seed):
    from engine.image import decode_pnm, encode_ppm

    w, h = wh
    img = _img(w, h, c, seed)
    back = decode_pnm(encode_ppm(img))
    want = img if img.ndim == 3 else img[:, :, None]
    assert (back == want).all()


@settings(max_examples=80, deadline=None)
@given(dims, st.integers(min_value=0, max_value=2**31))
def test_bmp_roundtrip(wh, seed):
    from engine.image import decode_bmp, encode_bmp

    w, h = wh
    img = _img(w, h, 3, seed)
    assert (decode_bmp(encode_bmp(img)) == img).all()


@settings(max_examples=80, deadline=None)
@given(dims, st.sampled_from([3, 4]), st.integers(min_value=0, max_value=2**31))
def test_tga_roundtrip(wh, c, seed):
    from engine.image import decode_tga, encode_tga

    w, h = wh
    img = _img(w, h, c, seed)
    assert (decode_tga(encode_tga(img)) == img).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(dims, min_size=0, max_size=6), st.integers(min_value=0, max_value=2**31),
       st.floats(min_value=0.5, max_value=120.0, allow_nan=False))
def test_ppmv_roundtrip(frame_dims, seed, fps):
    from engine.video import decode_frame, encode_ppmv, read_ppmv_index

    # PPMV frames may differ in size; every frame must roundtrip by index.
    frames = [_img(w, h, 3, seed + i) for i, (w, h) in enumerate(frame_dims)]
    blob = encode_ppmv(frames, fps=fps)
    n, got_fps, offs = read_ppmv_index(blob)
    assert n == len(frames)
    assert abs(got_fps - round(fps * 1000) / 1000.0) < 1e-9
    for i, f in enumerate(frames):
        assert (decode_frame(blob, offs, i) == f).all()


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200), st.integers(min_value=1, max_value=4))
def test_minhash_batch_equals_per_doc(text, width):
    """minhash_signatures_batch must equal minhash_signature per document."""
    from engine.ops.dedup import (_batch_shingle_hashes, _minhash_params,
                                  _shingle_hashes, minhash_signature,
                                  minhash_signatures_batch)

    seeds = _minhash_params(16)
    texts = [text, "", text + " tail", "one two three four"]
    flat, counts = _batch_shingle_hashes(texts, width)
    batch_sigs = minhash_signatures_batch(flat, counts, seeds, chunk_shingles=8)
    for i, t in enumerate(texts):
        ref = minhash_signature(_shingle_hashes(t or "", width), seeds)
        assert (batch_sigs[i] == ref).all(), (i, t)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=8), min_size=0, max_size=60))
def test_duplicate_runs_props(keys):
    from engine.ops.dedup import duplicate_runs

    arr = np.sort(np.asarray(keys, dtype=np.int64))
    runs = duplicate_runs(arr)
    # every run is a maximal block of equal keys with length >= 2
    covered = np.zeros(arr.size, dtype=bool)
    for start, length in runs:
        assert length >= 2
        assert (arr[start:start + length] == arr[start]).all()
        if start > 0:
            assert arr[start - 1] != arr[start]
        if start + length < arr.size:
            assert arr[start + length] != arr[start]
        covered[start:start + length] = True
    # rows outside runs are singletons
    uniq, counts = np.unique(arr, return_counts=True)
    expect_covered = sum(int(c) for c in counts if c >= 2)
    assert int(covered.sum()) == expect_covered


@settings(max_examples=150, deadline=None)
@given(st.dictionaries(st.integers(min_value=-10**9, max_value=10**9),
                       st.integers(min_value=0, max_value=127), max_size=40),
       st.lists(st.integers(min_value=-10**9, max_value=10**9), max_size=40))
def test_broadcast_map_equals_dict(mapping, queries):
    from engine.stages import BroadcastMap

    keys = np.fromiter(mapping.keys(), dtype=np.int64, count=len(mapping))
    vals = np.fromiter(mapping.values(), dtype=np.int8, count=len(mapping))
    bm = BroadcastMap(keys, vals)
    q = np.asarray(queries, dtype=np.int64)
    got_vals, found = bm.lookup(q)
    for i, k in enumerate(queries):
        assert found[i] == (k in mapping)
        if found[i]:
            assert got_vals[i] == mapping[k]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=120),
                          st.integers(min_value=0, max_value=120)),
                min_size=0, max_size=150))
def test_pointer_jumping_matches_union_find(edges):
    """minlabel_pointer_jumping == textbook union-find on arbitrary graphs
    (self-loops, duplicates, disconnected nodes, long chains)."""
    import numpy as np

    from engine.ops.cc import minlabel_pointer_jumping

    pairs = edges                   # self-loops INCLUDED: the kernel must
    if not pairs:                   # label a self-loop node as itself
        return
    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    nodes, labels = minlabel_pointer_jumping(a, b)
    got = dict(zip(nodes.tolist(), labels.tolist()))

    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for x, y in pairs:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    want = {n: find(n) for p in pairs for n in p}
    assert got == want
