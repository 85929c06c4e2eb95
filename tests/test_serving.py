"""RetrievalIndex: exact top-k by Hamming distance over packed codes."""

import numpy as np

from cmh_tpu.serving import RetrievalIndex


def _codes(n, bits, seed):
    rng = np.random.RandomState(seed)
    return rng.choice([-1.0, 1.0], size=(n, bits)).astype(np.float32)


def test_search_matches_bruteforce():
    bits = 32
    gallery = _codes(200, bits, 0)
    queries = _codes(7, bits, 1)
    index = RetrievalIndex(bits)
    index.add(gallery[:120])
    index.add(gallery[120:])
    assert len(index) == 200
    dist, idx = index.search(queries, topk=5)

    brute = (0.5 * (bits - queries @ gallery.T)).astype(np.int64)
    for qi in range(7):
        order = np.argsort(brute[qi], kind="stable")[:5]
        np.testing.assert_array_equal(idx[qi], order)
        np.testing.assert_array_equal(dist[qi], brute[qi][order])


def test_self_query_is_nearest():
    bits = 64
    gallery = _codes(50, bits, 2)
    index = RetrievalIndex(bits)
    index.add(gallery)
    dist, idx = index.search(gallery[:10], topk=1)
    np.testing.assert_array_equal(idx[:, 0], np.arange(10))
    np.testing.assert_array_equal(dist[:, 0], np.zeros(10))


def test_save_load_roundtrip(tmp_path):
    bits = 16
    gallery = _codes(30, bits, 3)
    index = RetrievalIndex(bits)
    index.add(gallery)
    path = str(tmp_path / "index.npz")
    index.save(path)
    loaded = RetrievalIndex.load(path)
    assert len(loaded) == 30
    d1, i1 = index.search(gallery[:4], topk=3)
    d2, i2 = loaded.search(gallery[:4], topk=3)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(d1, d2)
