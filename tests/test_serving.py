"""RetrievalIndex: exact top-k by Hamming distance over packed codes."""

import pytest
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


def test_search_cpu_matches_device_path():
    """Native CPU scorer (hash_ops.cpp) ≡ the JAX/Pallas search: same
    distances, same indices, same lower-index tie order. bits=8 forces heavy
    distance ties; bits=70 → 3 uint32 words (odd count exercises the paired
    u64 loads + the 32-bit tail); bits=64 → the aligned even-words path."""
    for bits, seed in [(8, 0), (64, 1), (70, 2)]:
        gallery = _codes(300, bits, seed)
        queries = _codes(9, bits, seed + 10)
        index = RetrievalIndex(bits)
        index.add(gallery[:150])
        index.add(gallery[150:])  # multi-chunk gallery
        d_dev, i_dev = index.search(queries, topk=7)
        d_cpu, i_cpu = index.search_cpu(queries, topk=7)
        np.testing.assert_array_equal(d_cpu, d_dev)
        np.testing.assert_array_equal(i_cpu, i_dev)


def test_search_cpu_numpy_fallback_and_k_equals_n(monkeypatch):
    """With the native lib unavailable, the numpy LUT fallback must produce
    identical results — incl. at topk == len(index) (full ranking)."""
    from cmh_tpu.native import hash_ops

    bits = 8  # ties guaranteed
    gallery = _codes(40, bits, 4)
    queries = _codes(5, bits, 5)
    index = RetrievalIndex(bits)
    index.add(gallery)
    d_nat, i_nat = index.search_cpu(queries, topk=40)
    monkeypatch.setattr(hash_ops, "available", lambda: False)
    d_np, i_np = index.search_cpu(queries, topk=40)
    np.testing.assert_array_equal(d_np, d_nat)
    np.testing.assert_array_equal(i_np, i_nat)
    d_dev, i_dev = index.search(queries, topk=40)
    np.testing.assert_array_equal(d_np, d_dev)
    np.testing.assert_array_equal(i_np, i_dev)


def test_pack_bits_host_matches_device():
    from cmh_tpu.ops.hashing import pack_bits
    from cmh_tpu.serving import _pack_bits_host

    codes = _codes(13, 70, 6)
    np.testing.assert_array_equal(
        _pack_bits_host(codes), np.asarray(pack_bits(codes))
    )


def test_native_hash_ops_multithreaded_matches_single():
    from cmh_tpu.native import hash_ops
    from cmh_tpu.serving import _pack_bits_host

    if not hash_ops.available():
        import pytest
        pytest.skip("native toolchain unavailable")
    qp = _pack_bits_host(_codes(64, 96, 7))
    gp = _pack_bits_host(_codes(500, 96, 8))
    d1, i1 = hash_ops.hamming_topk(qp, gp, 11, n_threads=1)
    d4, i4 = hash_ops.hamming_topk(qp, gp, 11, n_threads=4)
    np.testing.assert_array_equal(d1, d4)
    np.testing.assert_array_equal(i1, i4)


def test_deployment_path_export_then_cpu_serve(tmp_path):
    """Full deployment story with no trainer and no accelerator at serve
    time: export the encoders (StableHLO artifact), encode a gallery + text
    queries through the loaded artifact, index the image codes, persist the
    index, then answer cross-modal queries with search_cpu — and get exactly
    what the device path returns."""
    import jax
    import jax.numpy as jnp

    from cmh_tpu.config import config_from_dict
    from cmh_tpu.export import export_encoders, load_encoders
    from cmh_tpu.models.dcmht import DCMHTMethod

    cfg_model = config_from_dict(
        {"model": {"clip_variant": "tiny", "hash_func": "softmax"}}).model
    method = DCMHTMethod.from_config(cfg_model, output_dim=8)
    res = method.clip_cfg.image_resolution
    B, W = 6, 12
    rng = np.random.RandomState(11)
    image = jnp.asarray(rng.randn(B, res, res, 3), jnp.float32)
    text = jnp.asarray(rng.randint(1, 49405, (B, W)), jnp.int32)
    kpm = jnp.zeros((B, W), bool)
    variables = method.init_variables(
        jax.random.PRNGKey(0),
        {"image": image, "text": text, "key_padding_mask": kpm})
    path = str(tmp_path / "enc.cmh")
    export_encoders(method, variables, path, batch=B, max_words=W)

    # --- serve side: artifact + index only, no Method/trainer objects
    enc = load_encoders(path)
    gallery_codes = np.asarray(enc.encode_image(np.asarray(image)))
    query_codes = np.asarray(enc.encode_text(np.asarray(text),
                                             np.asarray(kpm)))
    index = RetrievalIndex(bits=8)
    index.add(gallery_codes)
    index.save(str(tmp_path / "index.npz"))
    served = RetrievalIndex.load(str(tmp_path / "index.npz"))

    d_cpu, i_cpu = served.search_cpu(query_codes, topk=3)
    d_dev, i_dev = served.search(query_codes, topk=3)
    np.testing.assert_array_equal(d_cpu, d_dev)
    np.testing.assert_array_equal(i_cpu, i_dev)
    assert d_cpu.shape == (B, 3) and i_cpu.dtype == np.int64


def test_device_search_blocked_matches_unblocked():
    """Device-side blocked search (gallery streamed through lax.scan, no
    (Q, N) distance matrix) must be bit-equal to the direct path — forcing
    tiny blocks (13 rows, incl. a ragged tail) with heavy ties (bits=8) so
    tie groups span block boundaries, and topk == len(index) so every
    rank, not just the easy head, must match."""
    bits = 8
    gallery = _codes(150, bits, 20)
    queries = _codes(6, bits, 21)
    index = RetrievalIndex(bits)
    index.add(gallery)
    want_d, want_i = index.search(queries, topk=150, block=1 << 20)
    for block in (13, 64, 150):
        got_d, got_i = index.search(queries, topk=150, block=block)
        np.testing.assert_array_equal(got_d, want_d)
        np.testing.assert_array_equal(got_i, want_i)
    # and against the independent CPU scorer at a normal topk
    d_blk, i_blk = index.search(queries, topk=9, block=13)
    d_cpu, i_cpu = index.search_cpu(queries, topk=9)
    np.testing.assert_array_equal(d_blk, d_cpu)
    np.testing.assert_array_equal(i_blk, i_cpu)


@pytest.mark.slow
def test_device_search_mesh_sharded_matches_single():
    """Gallery-sharded multi-chip search (8-device mesh, rows split across
    devices, all-gather merge) must be bit-equal to the single-device path
    — heavy ties (bits=8) spanning shard boundaries, a gallery size not
    divisible by the device count (ragged last shard), per-shard blocking
    forced tiny (block=7), and topk == one full shard so every candidate
    slot is exercised."""
    from cmh_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    assert mesh.size == 8
    # bits=8 → heavy ties; bits=70 → 3 uint32 words (odd-word path)
    for bits, seed in ((8, 30), (70, 32)):
        gallery = _codes(203, bits, seed)  # ceil(203/8)=26/shard, last=21
        queries = _codes(6, bits, seed + 1)
        index = RetrievalIndex(bits)
        index.add(gallery)
        want_d, want_i = index.search(queries, topk=26)
        for block in (7, 64):
            got_d, got_i = index.search(queries, topk=26, block=block,
                                        mesh=mesh)
            np.testing.assert_array_equal(got_d, want_d)
            np.testing.assert_array_equal(got_i, want_i)
    # the padded+sharded gallery placement is built once per mesh and
    # reused across calls (re-distributing all N rows per search would be
    # an O(N) transfer at the module's 100M-item pitch)
    assert len(index._sharded) == 1
    cached = next(iter(index._sharded.values()))[0]
    index.search(queries, topk=26, mesh=mesh)
    assert next(iter(index._sharded.values()))[0] is cached
    index.add(_codes(5, bits, 99))  # append invalidates the placement
    assert index._sharded == {}
    # topk larger than a shard is a named error, not silent truncation
    import pytest
    with pytest.raises(AssertionError, match="shard"):
        index.search(queries, topk=40, mesh=mesh)


def test_search_cpu_fallback_blocks_over_gallery(monkeypatch):
    """The numpy fallback merges per-gallery-block candidates via the
    composite dist·N+idx key — forcing tiny blocks (7 rows) with heavy ties
    (bits=8) must reproduce the unblocked result exactly, incl. ties that
    span block boundaries."""
    import cmh_tpu.serving as serving
    from cmh_tpu.native import hash_ops

    bits = 8
    gallery = _codes(60, bits, 9)
    queries = _codes(6, bits, 10)
    index = RetrievalIndex(bits)
    index.add(gallery)
    want_d, want_i = index.search(queries, topk=9)
    monkeypatch.setattr(hash_ops, "available", lambda: False)
    monkeypatch.setattr(serving, "_FALLBACK_BLOCK", 7)
    got_d, got_i = index.search_cpu(queries, topk=9)
    np.testing.assert_array_equal(got_d, want_d)
    np.testing.assert_array_equal(got_i, want_i)


def test_native_gallery_split_matches_query_split():
    """n_query < n_threads routes to the per-query gallery-split path (the
    online serving case); its merged result must equal the single-thread
    scan exactly, ties included (bits=8 → heavy ties)."""
    from cmh_tpu.native import hash_ops
    from cmh_tpu.serving import _pack_bits_host

    if not hash_ops.available():
        import pytest
        pytest.skip("native toolchain unavailable")
    gp = _pack_bits_host(_codes(997, 8, 12))
    for nq in (1, 3):
        qp = _pack_bits_host(_codes(nq, 8, 13))
        d1, i1 = hash_ops.hamming_topk(qp, gp, 15, n_threads=1)
        d4, i4 = hash_ops.hamming_topk(qp, gp, 15, n_threads=4)
        np.testing.assert_array_equal(d1, d4)
        np.testing.assert_array_equal(i1, i4)


@pytest.mark.slow
def test_search_paths_randomized_cross_exactness():
    """Seeded randomized sweep: auto/blocked/native-cpu/mesh-sharded search
    must agree bit-for-bit across random (bits, n, q, topk, block) incl.
    odd word counts, tile-boundary shapes, and heavy ties at tiny bits."""
    from cmh_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(1234)
    mesh = make_mesh()
    for _ in range(15):
        bits = int(rng.choice([4, 8, 31, 33, 64, 70, 128]))
        n = int(rng.randint(10, 300))
        q = int(rng.randint(1, 7))
        topk = int(rng.randint(1, min(n, 40) + 1))
        block = int(rng.choice([3, 16, 64, 1 << 20]))
        codes = rng.choice([-1.0, 1.0], size=(n, bits)).astype(np.float32)
        queries = rng.choice([-1.0, 1.0], size=(q, bits)).astype(np.float32)
        idx = RetrievalIndex(bits)
        idx.add(codes)
        d0, i0 = idx.search(queries, topk=topk)
        d1, i1 = idx.search(queries, topk=topk, block=block)
        d2, i2 = idx.search_cpu(queries, topk=topk)
        np.testing.assert_array_equal(d0, d1)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_array_equal(d0, d2)
        np.testing.assert_array_equal(i0, i2)
        if topk <= -(-n // mesh.size):
            d3, i3 = idx.search(queries, topk=topk, block=block, mesh=mesh)
            np.testing.assert_array_equal(d0, d3)
            np.testing.assert_array_equal(i0, i3)


@pytest.mark.slow
def test_counting_topk_matches_sort_path():
    """The counting-rank selection (serving._topk_counting — histogram
    threshold + cumsum/searchsorted collection, no sort over the gallery)
    must be bit-equal to the lax.top_k scan merge on every adversarial
    shape: heavy ties spanning blocks (bits=8), ALL-equal distances (every
    gallery row identical → the entire top-k comes from the tie channel),
    topk == n (every rank exercised), and single-row blocks."""
    import jax.numpy as jnp
    from cmh_tpu.ops.hashing import pack_bits
    from cmh_tpu.serving import _topk_counting, _topk_scan

    bits = 8
    cases = []
    g = _codes(157, bits, 40)
    cases.append((g, _codes(5, bits, 41), 157))      # topk == n, full ranks
    cases.append((g, _codes(5, bits, 42), 9))
    allsame = np.tile(_codes(1, bits, 43), (73, 1))  # ties only
    cases.append((allsame, _codes(4, bits, 44), 10))
    from cmh_tpu import serving as serving_mod

    orig_chunk = serving_mod._COLLECT_CHUNK
    orig_collect = serving_mod._COLLECT
    try:
        # both survivor-collection strategies (cumsum default + the gather
        # -based hier variant), and for hier a second pass with a tiny
        # collect chunk so survivors span multiple chunks and the
        # cross-chunk branch (cid>0: searchsorted into a later chunk +
        # prev-subtraction rank recovery) is exercised — at the default
        # 1024 every ≤157-row test gallery lands in chunk 0
        # trimat: blocks 1/13/64 exercise the pad-to-chunk-256 branch,
        # 4096 exercises multi-chunk reconstruction (c2 level carries)
        for collect, collect_chunk in (("cumsum", orig_chunk),
                                       ("trimat", orig_chunk),
                                       ("trimat2", orig_chunk),
                                       ("hier", orig_chunk), ("hier", 4)):
            serving_mod._COLLECT = collect
            serving_mod._COLLECT_CHUNK = collect_chunk
            for gallery, queries, topk in cases:
                qp = pack_bits(jnp.asarray(queries))
                gp = pack_bits(jnp.asarray(gallery))
                n = gallery.shape[0]
                for block in (1, 13, 64, 4096):
                    want = _topk_scan(qp, gp, topk, block, True, 0, n)
                    got = _topk_counting(qp, gp, topk, block, True, 0, n,
                                         bits)
                    np.testing.assert_array_equal(np.asarray(got[0]),
                                                  np.asarray(want[0]))
                    np.testing.assert_array_equal(np.asarray(got[1]),
                                                  np.asarray(want[1]))
    finally:
        serving_mod._COLLECT_CHUNK = orig_chunk
        serving_mod._COLLECT = orig_collect


def test_counting_topk_short_shard_pads_like_scan():
    """A shard holding fewer valid rows than topk (the sharded ragged
    tail) must yield the valid candidates first and sentinel distances in
    the padding slots, so the cross-shard merge stays exact."""
    import jax.numpy as jnp
    from cmh_tpu.ops.hashing import pack_bits
    from cmh_tpu.serving import _topk_counting

    bits = 8
    gallery, queries = _codes(20, bits, 50), _codes(3, bits, 51)
    qp = pack_bits(jnp.asarray(queries))
    gp = pack_bits(jnp.asarray(gallery))
    # global n_valid=12 with start=0: rows 12..19 are padding; topk=15 > 12
    d, i = _topk_counting(qp, gp, 15, 7, True, 0, 12, bits)
    d, i = np.asarray(d), np.asarray(i)
    sentinel = np.iinfo(np.int32).max
    assert (d[:, 12:] == sentinel).all() and (i[:, 12:] == 12).all()
    # the 12 valid candidates = exact stable order over rows [0, 12)
    brute = (0.5 * (bits - queries @ gallery[:12].T)).astype(np.int64)
    for qi in range(3):
        order = np.argsort(brute[qi], kind="stable")
        np.testing.assert_array_equal(i[qi, :12], order)
        np.testing.assert_array_equal(d[qi, :12], brute[qi][order])
