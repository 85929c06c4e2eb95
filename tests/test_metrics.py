import jax.numpy as jnp
import numpy as np
import torch

from cmh_tpu.ops.metrics import (
    calc_hamming_dist,
    calc_label_sim,
    calc_map_k,
    calc_map_k_numpy,
    cosine_similarity,
    euclidean_similarity,
    generate_weight_sim,
)


def _torch_calc_map_k(qB, rB, query_L, retrieval_L, k=None):
    """Literal re-execution of the reference calc_map_k semantics
    (reference common/calc_utils.py:58-92) as the parity oracle."""
    num_query = query_L.shape[0]
    if k is None:
        k = retrieval_L.shape[0]
    gnds = (query_L.mm(retrieval_L.t()) > 0).float()
    tsums = gnds.sum(dim=-1, keepdim=True).int()
    hamms = 0.5 * (rB.shape[1] - qB.mm(rB.t()))
    _, ind = torch.sort(hamms, dim=-1, stable=True)
    totals = torch.min(tsums, torch.tensor([k]).expand_as(tsums))
    m = 0.0
    for it in range(num_query):
        gnd = gnds[it][ind[it]]
        total = int(totals[it])
        count = torch.arange(1, total + 1).float()
        tindex = torch.nonzero(gnd)[:total].squeeze(-1).float() + 1.0
        m += float(torch.mean(count / tindex))
    return m / num_query


def _random_codes_labels(nq=23, nr=57, k_bits=16, n_cls=8, seed=0):
    rng = np.random.RandomState(seed)
    qb = rng.choice([-1.0, 1.0], size=(nq, k_bits)).astype(np.float32)
    rb = rng.choice([-1.0, 1.0], size=(nr, k_bits)).astype(np.float32)
    ql = (rng.rand(nq, n_cls) > 0.6).astype(np.float32)
    rl = (rng.rand(nr, n_cls) > 0.6).astype(np.float32)
    # guarantee at least one positive per query
    ql[:, 0] = 1.0
    rl[0, 0] = 1.0
    return qb, rb, ql, rl


def test_calc_label_sim():
    a = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    b = jnp.asarray([[1.0, 1.0], [0.0, 0.0]])
    np.testing.assert_array_equal(
        np.asarray(calc_label_sim(a, b)), [[1.0, 0.0], [1.0, 0.0]]
    )


def test_hamming_dist_matches_definition():
    qb, rb, _, _ = _random_codes_labels()
    got = np.asarray(calc_hamming_dist(jnp.asarray(qb), jnp.asarray(rb)))
    want = 0.5 * (qb.shape[1] - qb @ rb.T)
    np.testing.assert_allclose(got, want, atol=0)


def test_euclidean_cosine_similarity():
    rng = np.random.RandomState(3)
    a = rng.randn(4, 8).astype(np.float32)
    b = rng.randn(6, 8).astype(np.float32)
    got = np.asarray(euclidean_similarity(jnp.asarray(a), jnp.asarray(b)))
    want = torch.cdist(torch.tensor(a), torch.tensor(b), p=2.0).numpy()
    # |a|^2+|b|^2-2ab in fp32 loses a few ulps vs cdist's pairwise form
    np.testing.assert_allclose(got, want, atol=1e-2)

    got_c = np.asarray(cosine_similarity(jnp.asarray(a), jnp.asarray(b)))
    an = a / np.linalg.norm(a, axis=-1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=-1, keepdims=True)
    np.testing.assert_allclose(got_c, an @ bn.T, atol=1e-4)


def test_generate_weight_sim_matches_torch_reference():
    rng = np.random.RandomState(5)
    a = (rng.rand(6, 4) > 0.5).astype(np.float32)
    a[:, 0] = 1.0
    ta = torch.tensor(a)
    # reference generate_weight_sim re-executed literally
    sim_origin = ta.matmul(ta.t())
    label_sim_t = (sim_origin > 0).float()
    ideal_list = torch.sort(sim_origin, dim=1, descending=True)[0]
    ph = torch.arange(0.0, 6) + 2
    th = torch.log2(ph.repeat(1, 6).reshape(6, 6))
    Z = (((2**ideal_list - 1) / th).sum(axis=1)).reshape(-1, 1)
    want = (2**sim_origin - 1) / Z

    ls, ws = generate_weight_sim(jnp.asarray(a), jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(ls), label_sim_t.numpy(), atol=0)
    np.testing.assert_allclose(np.asarray(ws), want.numpy(), rtol=1e-4)


def test_calc_map_k_matches_torch_reference_mapall():
    qb, rb, ql, rl = _random_codes_labels()
    want = _torch_calc_map_k(
        torch.tensor(qb), torch.tensor(rb), torch.tensor(ql), torch.tensor(rl)
    )
    got = calc_map_k(qb, rb, ql, rl, k=None, chunk=8)
    assert abs(got - want) < 1e-5
    # numpy oracle agrees too
    assert abs(calc_map_k_numpy(qb, rb, ql, rl) - want) < 1e-6


def test_calc_map_k_matches_torch_reference_topk():
    qb, rb, ql, rl = _random_codes_labels(nq=17, nr=101, seed=2)
    for k in (1, 5, 50):
        want = _torch_calc_map_k(
            torch.tensor(qb), torch.tensor(rb), torch.tensor(ql), torch.tensor(rl), k=k
        )
        got = calc_map_k(qb, rb, ql, rl, k=k, chunk=16)
        assert abs(got - want) < 1e-5, f"k={k}"


def test_calc_map_k_perfect_retrieval_is_one():
    # identical codes+labels: every query's own class ranks first
    codes = np.asarray([[1.0, 1.0], [-1.0, -1.0]] * 3, dtype=np.float32)
    labels = np.asarray([[1, 0], [0, 1]] * 3, dtype=np.float32)
    got = calc_map_k(codes, codes, labels, labels)
    assert abs(got - 1.0) < 1e-6


def test_calc_map_k_long_codes_argsort_route():
    """>256-bit codes (TwDH long codes) take the argsort path — verify it
    against the numpy oracle."""
    rng = np.random.RandomState(12)
    qb = rng.choice([-1.0, 1.0], size=(9, 512)).astype(np.float32)
    rb = rng.choice([-1.0, 1.0], size=(71, 512)).astype(np.float32)
    ql = (rng.rand(9, 4) > 0.5).astype(np.float32)
    rl = (rng.rand(71, 4) > 0.5).astype(np.float32)
    ql[:, 0] = 1
    rl[0, 0] = 1
    want = calc_map_k_numpy(qb, rb, ql, rl)
    got = calc_map_k(qb, rb, ql, rl, chunk=4)
    assert abs(got - want) < 1e-5
    # and with a k-limit
    want_k = calc_map_k_numpy(qb, rb, ql, rl, k=10)
    got_k = calc_map_k(qb, rb, ql, rl, k=10, chunk=4)
    assert abs(got_k - want_k) < 1e-5
