"""Counting-rank mAP must be bit-identical to the argsort path and the
torch/numpy oracles."""

import jax
import numpy as np
import pytest

from cmh_tpu.ops.map_bucketed import calc_map_k_4dir, calc_map_k_bucketed
from cmh_tpu.ops.metrics import calc_map_k_numpy


def _data(nq, nr, bits, n_cls, seed):
    rng = np.random.RandomState(seed)
    qb = rng.choice([-1.0, 1.0], size=(nq, bits)).astype(np.float32)
    rb = rng.choice([-1.0, 1.0], size=(nr, bits)).astype(np.float32)
    ql = (rng.rand(nq, n_cls) > 0.6).astype(np.float32)
    rl = (rng.rand(nr, n_cls) > 0.6).astype(np.float32)
    ql[:, 0] = 1
    rl[0, 0] = 1
    return qb, rb, ql, rl


@pytest.mark.parametrize("bits,k", [(16, None), (16, 7), (64, None), (64, 25)])
def test_bucketed_matches_numpy_oracle(bits, k):
    qb, rb, ql, rl = _data(13, 97, bits, 6, seed=bits)
    want = calc_map_k_numpy(qb, rb, ql, rl, k=k)
    got = calc_map_k_bucketed(qb, rb, ql, rl, k=k, chunk=8, block=32)
    assert abs(got - want) < 1e-5, (got, want)


def test_bucketed_heavy_ties():
    # tiny bit-width forces massive distance ties — the stable tie-break
    # by gallery index must match exactly
    qb, rb, ql, rl = _data(9, 200, 4, 3, seed=1)
    want = calc_map_k_numpy(qb, rb, ql, rl)
    got = calc_map_k_bucketed(qb, rb, ql, rl, chunk=4, block=16)
    assert abs(got - want) < 1e-5


def test_bucketed_block_not_dividing_gallery():
    qb, rb, ql, rl = _data(5, 77, 8, 3, seed=2)
    want = calc_map_k_numpy(qb, rb, ql, rl)
    got = calc_map_k_bucketed(qb, rb, ql, rl, chunk=5, block=32)
    assert abs(got - want) < 1e-5


def test_4dir_matches_independent_calls():
    from cmh_tpu.ops.map_bucketed import calc_map_k_4dir

    rng = np.random.RandomState(9)
    nq, nr, bits, c = 17, 83, 16, 5
    qi = rng.choice([-1.0, 1.0], size=(nq, bits)).astype(np.float32)
    qt = rng.choice([-1.0, 1.0], size=(nq, bits)).astype(np.float32)
    ri = rng.choice([-1.0, 1.0], size=(nr, bits)).astype(np.float32)
    rt = rng.choice([-1.0, 1.0], size=(nr, bits)).astype(np.float32)
    ql = (rng.rand(nq, c) > 0.5).astype(np.float32)
    rl = (rng.rand(nr, c) > 0.5).astype(np.float32)
    ql[:, 0] = 1
    rl[0, 0] = 1
    got = calc_map_k_4dir(qi, qt, ri, rt, ql, rl, k=None, chunk=8, block=32)
    want = (
        calc_map_k_numpy(qi, rt, ql, rl),
        calc_map_k_numpy(qt, ri, ql, rl),
        calc_map_k_numpy(qi, ri, ql, rl),
        calc_map_k_numpy(qt, rt, ql, rl),
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bucketed_fp32_large_block():
    qb, rb, ql, rl = _data(9, 300, 16, 4, seed=11)
    want = calc_map_k_numpy(qb, rb, ql, rl)
    got = calc_map_k_bucketed(qb, rb, ql, rl, chunk=9, block=512)
    assert abs(got - want) < 1e-5


def test_pallas_4dir_matches_bucketed_jnp():
    """Fused Pallas counting-rank kernel (interpret mode) == XLA bucketed
    path == the torch-oracle-verified semantics, incl. pad/tie edge cases."""
    from cmh_tpu.ops.map_pallas import calc_map_k_4dir_pallas

    rng = np.random.RandomState(11)
    nq, nr, bits, classes = 37, 203, 16, 5   # deliberately non-multiples
    qi = rng.choice([-1.0, 1.0], size=(nq, bits)).astype(np.float32)
    qt = rng.choice([-1.0, 1.0], size=(nq, bits)).astype(np.float32)
    ri = rng.choice([-1.0, 1.0], size=(nr, bits)).astype(np.float32)
    rt = rng.choice([-1.0, 1.0], size=(nr, bits)).astype(np.float32)
    ql = (rng.rand(nq, classes) > 0.6).astype(np.float32)
    ql[:, 0] = 1
    rl = (rng.rand(nr, classes) > 0.6).astype(np.float32)
    rl[: nr // 3, 0] = 1

    for k in (None, 50):
        want = calc_map_k_4dir(qi, qt, ri, rt, ql, rl, k, chunk=32, block=64)
        got = calc_map_k_4dir_pallas(
            qi, qt, ri, rt, ql, rl, k, chunk=16, tq=8, tn=64, interpret=True
        )
        np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-6)


def test_pallas_4dir_long_codes_uint16():
    """128-bit codes (TwDH long codes) exceed uint8 packing — the kernel
    stores 2·d+g in uint16 and must stay exact vs the XLA bucketed path."""
    from cmh_tpu.ops.map_pallas import calc_map_k_4dir_pallas

    rng = np.random.RandomState(7)
    nq, nr, bits, classes = 21, 157, 128, 4
    qi = rng.choice([-1.0, 1.0], size=(nq, bits)).astype(np.float32)
    qt = rng.choice([-1.0, 1.0], size=(nq, bits)).astype(np.float32)
    ri = rng.choice([-1.0, 1.0], size=(nr, bits)).astype(np.float32)
    rt = rng.choice([-1.0, 1.0], size=(nr, bits)).astype(np.float32)
    ql = (rng.rand(nq, classes) > 0.5).astype(np.float32)
    ql[:, 0] = 1
    rl = (rng.rand(nr, classes) > 0.5).astype(np.float32)
    rl[: nr // 3, 0] = 1

    want = calc_map_k_4dir(qi, qt, ri, rt, ql, rl, None, chunk=32, block=64)
    got = calc_map_k_4dir_pallas(
        qi, qt, ri, rt, ql, rl, None, chunk=16, tq=8, tn=64, interpret=True
    )
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-6)


@pytest.mark.parametrize("bits,k", [(300, None), (512, 40)])
def test_pallas_4dir_wide_codes_f32_path(bits, k):
    """Codes over 255 bits switch the in-kernel replication matmul to f32
    (bf16 holds exact ints only to 256) — TwDH's 512-bit long codes now take
    the counting-rank kernel instead of the chunked argsort. Exact vs the
    XLA bucketed path, including a top-k cap and uneven tails."""
    from cmh_tpu.ops.map_pallas import calc_map_k_4dir_pallas

    rng = np.random.RandomState(bits)
    nq, nr, classes = 13, 149, 4
    qi = rng.choice([-1.0, 1.0], size=(nq, bits)).astype(np.float32)
    qt = rng.choice([-1.0, 1.0], size=(nq, bits)).astype(np.float32)
    ri = rng.choice([-1.0, 1.0], size=(nr, bits)).astype(np.float32)
    rt = rng.choice([-1.0, 1.0], size=(nr, bits)).astype(np.float32)
    ql = (rng.rand(nq, classes) > 0.5).astype(np.float32)
    ql[:, 0] = 1
    rl = (rng.rand(nr, classes) > 0.5).astype(np.float32)
    rl[: nr // 3, 0] = 1

    from cmh_tpu.ops.metrics import calc_map_k_numpy

    want = [calc_map_k_numpy(q, r, ql, rl, k)
            for q, r in ((qi, rt), (qt, ri), (qi, ri), (qt, rt))]
    got = calc_map_k_4dir_pallas(
        qi, qt, ri, rt, ql, rl, k, chunk=8, tq=8, tn=64, interpret=True
    )
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-6)


def test_pallas_4dir_wide_codes_heavy_ties():
    """Wide path with few distinct distances (many ties) — the stable-tie
    counting math must stay exact when whole buckets are saturated."""
    from cmh_tpu.ops.map_pallas import calc_map_k_4dir_pallas

    rng = np.random.RandomState(3)
    nq, nr, bits, classes = 9, 77, 260, 3
    base = rng.choice([-1.0, 1.0], size=bits).astype(np.float32)
    # gallery items differ from `base` in only a handful of positions →
    # distances concentrate in a few buckets
    def near(n):
        out = np.tile(base, (n, 1))
        for i in range(n):
            flips = rng.choice(bits, size=rng.randint(0, 4), replace=False)
            out[i, flips] *= -1
        return out

    qi, qt, ri, rt = near(nq), near(nq), near(nr), near(nr)
    ql = (rng.rand(nq, classes) > 0.4).astype(np.float32)
    ql[:, 0] = 1
    rl = (rng.rand(nr, classes) > 0.4).astype(np.float32)
    rl[: nr // 2, 0] = 1

    from cmh_tpu.ops.metrics import calc_map_k_numpy

    want = [calc_map_k_numpy(q, r, ql, rl, None)
            for q, r in ((qi, rt), (qt, ri), (qi, ri), (qt, rt))]
    got = calc_map_k_4dir_pallas(
        qi, qt, ri, rt, ql, rl, None, chunk=16, tq=8, tn=64, interpret=True
    )
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-6)


def test_4dir_auto_wide_cpu_fallback():
    """Off-TPU, >256-bit codes must route to the chunked-argsort path (the
    XLA bucketed oracle caps at 256) — this is TwDH's long-code eval path
    on the CPU test mesh."""
    from cmh_tpu.ops.map_bucketed import calc_map_k_4dir_auto
    from cmh_tpu.ops.metrics import calc_map_k

    rng = np.random.RandomState(11)
    nq, nr, bits, classes = 7, 41, 300, 3
    qi = rng.choice([-1.0, 1.0], size=(nq, bits)).astype(np.float32)
    qt = rng.choice([-1.0, 1.0], size=(nq, bits)).astype(np.float32)
    ri = rng.choice([-1.0, 1.0], size=(nr, bits)).astype(np.float32)
    rt = rng.choice([-1.0, 1.0], size=(nr, bits)).astype(np.float32)
    ql = (rng.rand(nq, classes) > 0.5).astype(np.float32)
    ql[:, 0] = 1
    rl = (rng.rand(nr, classes) > 0.5).astype(np.float32)
    rl[: nr // 2, 0] = 1

    got = calc_map_k_4dir_auto(qi, qt, ri, rt, ql, rl, None)
    want = [calc_map_k(q, r, ql, rl, None)
            for q, r in ((qi, rt), (qt, ri), (qi, ri), (qt, rt))]
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.slow
def test_map_4dir_randomized_vs_oracle():
    """Seeded randomized sweep over (bits, shapes, k): the auto 4-direction
    route and the Pallas counting-rank kernel (interpret, tiny tiles so
    tile boundaries land everywhere) must match the per-direction
    calc_map_k oracle — incl. wide codes (300/512) and heavy ties."""
    from cmh_tpu.ops.map_bucketed import calc_map_k_4dir_auto
    from cmh_tpu.ops.map_pallas import calc_map_k_4dir_pallas
    from cmh_tpu.ops.metrics import calc_map_k

    rng = np.random.RandomState(77)
    for _ in range(8):
        bits = int(rng.choice([4, 16, 17, 64, 300, 512]))
        nq = int(rng.randint(3, 14))
        nr = int(rng.randint(8, 50))
        classes = int(rng.choice([2, 3, 8]))
        k = None if rng.rand() < 0.5 else int(rng.randint(1, nr + 1))
        qi, qt = (rng.choice([-1.0, 1.0], size=(nq, bits)).astype(np.float32)
                  for _ in range(2))
        ri, rt = (rng.choice([-1.0, 1.0], size=(nr, bits)).astype(np.float32)
                  for _ in range(2))
        ql = (rng.rand(nq, classes) > 0.5).astype(np.float32)
        ql[:, 0] = 1
        rl = (rng.rand(nr, classes) > 0.5).astype(np.float32)
        rl[: max(1, nr // 3), 0] = 1
        want = [float(calc_map_k(a, b, ql, rl, k))
                for a, b in ((qi, rt), (qt, ri), (qi, ri), (qt, rt))]
        got_auto = calc_map_k_4dir_auto(qi, qt, ri, rt, ql, rl, k)
        np.testing.assert_allclose(got_auto, want, atol=1e-5)
        got_p = calc_map_k_4dir_pallas(qi, qt, ri, rt, ql, rl, k,
                                       chunk=8, tq=4, tn=16, interpret=True)
        np.testing.assert_allclose(got_p, want, atol=1e-5)


@pytest.mark.parametrize("bits", [1024, 2048])
def test_pallas_4dir_twdh_long_center_widths(bits):
    """TwDH ships 1024- and 2048-bit long centers
    (/root/reference/data/transformer/TwDH/coco/long/{1024,2048}.pkl,
    models/TwDH/TwDH.py:89-97) — these widths must take the counting-rank
    kernel's wide path exactly (VERDICT r4 item 3: they previously fell to
    chunked argsort above the old 1022-bit ceiling). Interpret mode with
    the production tiles from _pallas_tiles."""
    from cmh_tpu.ops.map_bucketed import _pallas_tiles
    from cmh_tpu.ops.map_pallas import calc_map_k_4dir_pallas
    from cmh_tpu.ops.metrics import calc_map_k_numpy

    rng = np.random.RandomState(bits)
    nq, nr, classes = 5, 61, 3
    qi = rng.choice([-1.0, 1.0], size=(nq, bits)).astype(np.float32)
    qt = rng.choice([-1.0, 1.0], size=(nq, bits)).astype(np.float32)
    ri = rng.choice([-1.0, 1.0], size=(nr, bits)).astype(np.float32)
    rt = rng.choice([-1.0, 1.0], size=(nr, bits)).astype(np.float32)
    ql = (rng.rand(nq, classes) > 0.5).astype(np.float32)
    ql[:, 0] = 1
    rl = (rng.rand(nr, classes) > 0.5).astype(np.float32)
    rl[: nr // 3, 0] = 1

    tq, tn, _ = _pallas_tiles(bits)
    assert tq == (4 if bits <= 2046 else 2) and tn == 64
    want = [calc_map_k_numpy(q, r, ql, rl, None)
            for q, r in ((qi, rt), (qt, ri), (qi, ri), (qt, rt))]
    got = calc_map_k_4dir_pallas(
        qi, qt, ri, rt, ql, rl, None, chunk=4, tq=tq, tn=tn, interpret=True
    )
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-6)


def test_4dir_auto_routes_long_centers_to_pallas_on_tpu(monkeypatch):
    """Routing assertion (VERDICT r4 item 3): on a TPU backend 1024/2048-bit
    codes take the Pallas kernel with the wide tiles; only >4094-bit codes
    fall to the chunked-argsort route."""
    import cmh_tpu.ops.map_pallas as mp
    from cmh_tpu.ops.map_bucketed import calc_map_k_4dir_auto

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    calls = []

    def fake_pallas(*a, **kw):
        calls.append((a[0].shape[1], kw.get("tq"), kw.get("tn")))
        return (0.0, 0.0, 0.0, 0.0)

    monkeypatch.setattr(mp, "calc_map_k_4dir_pallas", fake_pallas)

    def mk(bits):
        rng = np.random.RandomState(0)
        c = rng.choice([-1.0, 1.0], size=(3, bits)).astype(np.float32)
        l = np.ones((3, 2), np.float32)
        return c, l

    for bits, tq in ((1024, 4), (2048, 2)):
        c, l = mk(bits)
        calc_map_k_4dir_auto(c, c, c, c, l, l, None)
        assert calls[-1] == (bits, tq, 64), calls[-1]

    # beyond the kernel ceiling: must NOT call the pallas path
    n_before = len(calls)
    c, l = mk(4096)
    calc_map_k_4dir_auto(c, c, c, c, l, l, None)
    assert len(calls) == n_before
