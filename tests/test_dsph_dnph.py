"""DSPH and DNPH: loss parity vs in-test torch oracles + train smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from cmh_tpu.models.dnph import dnph_proxy_loss
from cmh_tpu.models.dsph import hyp_loss, lookup_threshold
from cmh_tpu.ops.hungarian import assign_noise, hungarian_assignment, rand_unit_rect

from util_methods import run_steps, tiny_trainer


# ----------------------------------------------------------------- codetable
def test_lookup_threshold_known_values():
    # extracted from the reference workbook: 16 bits / 80 classes (col 7)
    assert lookup_threshold(16, 80) == 0.375
    assert lookup_threshold(64, 80) == 0.09375
    # 3 bits / 4 classes (col 2 of 0-indexed sheet row 3 in the workbook)
    assert abs(lookup_threshold(3, 4) - (1 / 3)) < 1e-9


# --------------------------------------------------------------- DSPH oracle
def _torch_hyp(x, y, label, proxies, threshold, alpha):
    """Literal torch re-execution of reference HyP.forward (loss/HyP.py)."""
    P_one_hot = label
    cos = F.normalize(x, 2, 1).mm(F.normalize(proxies, 2, 1).T)
    pos, neg = 1 - cos, F.relu(cos - threshold)
    cos_t = F.normalize(y, 2, 1).mm(F.normalize(proxies, 2, 1).T)
    pos_t, neg_t = 1 - cos_t, F.relu(cos_t - threshold)
    P_num = len(P_one_hot.nonzero())
    N_num = len((P_one_hot == 0).nonzero())
    z = torch.zeros_like(cos)
    total = (
        torch.where(P_one_hot == 1, pos, z).sum() / P_num
        + torch.where(P_one_hot == 0, neg, z).sum() / N_num
        + torch.where(P_one_hot == 1, pos_t, z).sum() / P_num
        + torch.where(P_one_hot == 0, neg_t, z).sum() / N_num
    )
    if alpha > 0:
        index = label.sum(dim=1) > 1
        label_ = label[index].float()
        x_, t_ = x[index], y[index]
        cos_sim = label_.mm(label_.T)
        if len((cos_sim == 0).nonzero()) > 0:
            xs = F.normalize(x_, 2, 1).mm(F.normalize(x_, 2, 1).T)
            ts = F.normalize(t_, 2, 1).mm(F.normalize(t_, 2, 1).T)
            xts = F.normalize(x_, 2, 1).mm(F.normalize(t_, 2, 1).T)
            denom = len((cos_sim == 0).nonzero())
            for s in (xs, ts, xts):
                total = total + torch.where(
                    cos_sim == 0, alpha * F.relu(s - threshold),
                    torch.zeros_like(s),
                ).sum() / denom
    return float(total)


@pytest.mark.parametrize("alpha", [0.0, 0.8])
def test_dsph_hyp_loss_parity(alpha):
    rng = np.random.RandomState(0)
    b, k, c = 12, 16, 6
    img = rng.randn(b, k).astype(np.float32)
    txt = rng.randn(b, k).astype(np.float32)
    proxies = rng.randn(c, k).astype(np.float32)
    labels = (rng.rand(b, c) > 0.6).astype(np.float32)
    labels[:, 0] = 1
    labels[0] = 0
    labels[0, 1] = 1
    want = _torch_hyp(
        torch.tensor(img), torch.tensor(txt), torch.tensor(labels),
        torch.tensor(proxies), threshold=0.375, alpha=alpha,
    )
    got = float(
        hyp_loss(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(proxies),
                 jnp.asarray(labels), threshold=0.375, alpha=alpha)
    )
    assert abs(got - want) < 1e-4


# --------------------------------------------------------------- DNPH oracle
def _torch_dnph_proxy(img, txt, ip, tp, proxies, labels, mrg):
    feature_all = torch.cat((img, txt), dim=0)
    label_all = torch.cat((labels, labels), dim=0)
    proxies_n = F.normalize(proxies, p=2, dim=-1)
    feats = F.normalize(feature_all, p=2, dim=-1)
    D_ = torch.cdist(feats, proxies_n) ** 2
    m = torch.zeros_like(D_)
    m[label_all == 1] = m[label_all == 1] + mrg
    D_ = D_ + m
    p_loss = torch.sum(-label_all * F.log_softmax(-D_, 1), -1).mean()
    ce = torch.nn.CrossEntropyLoss()
    d_loss = ce(ip, torch.argmax(labels, -1)) + ce(tp, torch.argmax(labels, -1))
    return float(p_loss + d_loss)


def test_dnph_proxy_loss_parity():
    rng = np.random.RandomState(1)
    b, k, c = 10, 16, 5
    img = np.tanh(rng.randn(b, k)).astype(np.float32)
    txt = np.tanh(rng.randn(b, k)).astype(np.float32)
    ip = rng.randn(b, c).astype(np.float32)
    tp = rng.randn(b, c).astype(np.float32)
    proxies = (rng.randn(c, k) / 8).astype(np.float32)
    labels = np.eye(c, dtype=np.float32)[rng.randint(0, c, b)]
    want = _torch_dnph_proxy(
        torch.tensor(img), torch.tensor(txt), torch.tensor(ip),
        torch.tensor(tp), torch.tensor(proxies), torch.tensor(labels), 1.0,
    )
    got = float(
        dnph_proxy_loss(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(ip),
                        jnp.asarray(tp), jnp.asarray(proxies),
                        jnp.asarray(labels), mrg=1.0)
    )
    assert abs(got - want) < 1e-4


# ------------------------------------------------------------------ hungarian
def test_hungarian_matches_scipy():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(2)
    cost = rng.rand(8, 8).astype(np.float32)
    got = np.asarray(hungarian_assignment(jnp.asarray(cost)))
    _, want = linear_sum_assignment(cost)
    np.testing.assert_array_equal(got, want)


def test_assign_noise_reduces_cost():
    rng = np.random.RandomState(3)
    codes = jnp.asarray(np.tanh(rng.randn(6, 8)).astype(np.float32))
    noises = rand_unit_rect(jax.random.PRNGKey(0), 6, 8)
    assigned = assign_noise(codes, noises)
    # assignment is a permutation of the rows
    a = np.asarray(assigned)
    n = np.asarray(noises)
    matched = sum(any(np.array_equal(a[i], n[j]) for j in range(6)) for i in range(6))
    assert matched == 6
    base = float(jnp.linalg.norm(codes - noises, axis=1).sum())
    opt = float(jnp.linalg.norm(codes - assigned, axis=1).sum())
    assert opt <= base + 1e-6


# -------------------------------------------------------------- train smokes
def test_dsph_train_smoke(tmp_path):
    tr = tiny_trainer(tmp_path, "DSPH", "DSPHTrainer",
                      model_extra={"hash_func": "tanh", "numclass": 4,
                                   "alpha": 0.8},
                      optimizer_extra={"hyp": {"lr": 0.02}})
    losses = run_steps(tr, n=4)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    maps = tr.valid(epoch=0)
    assert all(0 <= m <= 1 for m in maps)


def test_dnph_train_smoke(tmp_path):
    tr = tiny_trainer(tmp_path, "DNPH", "DNPHTrainer",
                      model_extra={"hash_func": "tanh", "numclass": 4,
                                   "mrg": 1.0, "noise_alpha": 0.1},
                      optimizer_extra={"loss": {"lr": 0.0001}})
    losses = run_steps(tr, n=4)
    assert np.isfinite(losses).all()
    maps = tr.valid(epoch=0)
    assert all(0 <= m <= 1 for m in maps)


def test_greedy_assignment_is_valid_permutation():
    from cmh_tpu.ops.hungarian import greedy_assignment

    rng = np.random.RandomState(4)
    cost = rng.rand(12, 12).astype(np.float32)
    col = np.asarray(greedy_assignment(jnp.asarray(cost)))
    assert sorted(col.tolist()) == list(range(12))
    # greedy never beats the optimal but must beat a random permutation
    # in expectation; check against identity
    from scipy.optimize import linear_sum_assignment

    _, opt = linear_sum_assignment(cost)
    greedy_cost = cost[np.arange(12), col].sum()
    opt_cost = cost[np.arange(12), opt].sum()
    ident_cost = np.trace(cost)
    assert opt_cost <= greedy_cost <= ident_cost + 1e-6 or greedy_cost < ident_cost


def test_assign_noise_greedy_path():
    rng = np.random.RandomState(5)
    codes = jnp.asarray(np.tanh(rng.randn(6, 8)).astype(np.float32))
    noises = rand_unit_rect(jax.random.PRNGKey(1), 6, 8)
    assigned = assign_noise(codes, noises, method="greedy")
    a, n = np.asarray(assigned), np.asarray(noises)
    matched = sum(any(np.array_equal(a[i], n[j]) for j in range(6)) for i in range(6))
    assert matched == 6


# --------------------------------------- reference modules as oracles
# (not hand-transcribed re-executions: the following import and run the
# actual /root/reference loss code)

def _ref():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ref_shims import load_reference

    load_reference()


@pytest.mark.parametrize("alpha", [0.0, 0.8])
def test_dsph_hyp_parity_vs_reference_module(alpha):
    """Runs the real reference HyP (/root/reference/models/DSPH/loss/HyP.py)."""
    _ref()
    from models.DSPH.loss.HyP import HyP

    rng = np.random.RandomState(0)
    b, k, c = 12, 16, 6
    img = rng.randn(b, k).astype(np.float32)
    txt = rng.randn(b, k).astype(np.float32)
    proxies = rng.randn(c, k).astype(np.float32)
    labels = (rng.rand(b, c) > 0.6).astype(np.float32)
    labels[:, 0] = 1
    labels[0] = 0
    labels[0, 1] = 1
    ref = HyP(numclass=c, output_dim=k, alpha=alpha, threshold=0.375)
    with torch.no_grad():
        ref.proxies.data = torch.tensor(proxies)
        want = float(ref(torch.tensor(img), torch.tensor(txt),
                         torch.tensor(labels)))
    got = float(
        hyp_loss(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(proxies),
                 jnp.asarray(labels), threshold=0.375, alpha=alpha)
    )
    assert abs(got - want) < 1e-4


def test_dnph_loss_parity_vs_reference_module():
    """Runs the real reference Loss (/root/reference/models/DNPH/loss/loss.py)."""
    _ref()
    from models.DNPH.loss.loss import Loss

    rng = np.random.RandomState(1)
    b, k, c = 10, 16, 5
    img = np.tanh(rng.randn(b, k)).astype(np.float32)
    txt = np.tanh(rng.randn(b, k)).astype(np.float32)
    ip = rng.randn(b, c).astype(np.float32)
    tp = rng.randn(b, c).astype(np.float32)
    proxies = (rng.randn(c, k) / 8).astype(np.float32)
    labels = np.eye(c, dtype=np.float32)[rng.randint(0, c, b)]
    ref = Loss(num_classes=c, output_dim=k, mrg=1.0)
    with torch.no_grad():
        ref.proxies.data = torch.tensor(proxies)
        want = float(ref(torch.tensor(img), torch.tensor(txt),
                         torch.tensor(ip), torch.tensor(tp),
                         torch.tensor(labels), torch.tensor(labels)))
    got = float(
        dnph_proxy_loss(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(ip),
                        jnp.asarray(tp), jnp.asarray(proxies),
                        jnp.asarray(labels), mrg=1.0)
    )
    assert abs(got - want) < 1e-4


def test_dnph_noise_assignment_matches_reference_gene_noise():
    """Runs the real reference gene_noise
    (/root/reference/models/DNPH/loss/b_reg.py:21-41)."""
    _ref()
    from models.DNPH.loss.b_reg import gene_noise

    rng = np.random.RandomState(2)
    b, k = 24, 16
    codes = np.tanh(rng.randn(b, k)).astype(np.float64)
    noises = (rng.randint(0, 2, size=(b, k)) * 2 - 1).astype(np.float64)
    want = gene_noise(codes, noises)
    got = np.asarray(
        assign_noise(jnp.asarray(codes, jnp.float32),
                     jnp.asarray(noises, jnp.float32), method="hungarian")
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("n", [1, 2, 7, 32, 128])
def test_auction_matches_scipy_optimal_cost(n):
    """On-device auction assignment reaches the scipy optimum (VERDICT #5:
    exact assignment on backends without host callbacks)."""
    from scipy.optimize import linear_sum_assignment

    from cmh_tpu.ops.hungarian import auction_assignment

    rng = np.random.RandomState(n)
    cost = rng.rand(n, n).astype(np.float32) * 10.0
    col = np.asarray(auction_assignment(jnp.asarray(cost)))
    # valid permutation
    assert sorted(col.tolist()) == list(range(n))
    _, scipy_col = linear_sum_assignment(cost.astype(np.float64))
    got = cost[np.arange(n), col].sum()
    want = cost[np.arange(n), scipy_col].sum()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_auction_on_structured_dnph_costs():
    """DNPH-shaped cost matrices (L2 between tanh codes and ±1 noise)."""
    from scipy.optimize import linear_sum_assignment

    from cmh_tpu.ops.hungarian import assign_noise

    rng = np.random.RandomState(5)
    b, k = 64, 16
    codes = np.tanh(rng.randn(b, k)).astype(np.float32)
    noises = (rng.randint(0, 2, (b, k)) * 2 - 1).astype(np.float32)
    got = np.asarray(assign_noise(jnp.asarray(codes), jnp.asarray(noises),
                                  method="auction"))
    cost = np.linalg.norm(codes[:, None] - noises[None, :], axis=-1)
    _, col = linear_sum_assignment(cost.astype(np.float64))
    want_total = cost[np.arange(b), col].sum()
    got_total = np.linalg.norm(codes - got, axis=-1).sum()
    np.testing.assert_allclose(got_total, want_total, rtol=1e-6)


def test_auction_always_permutation_under_saturated_ties():
    """Late-DNPH regime: codes saturate to exact ±1 so cost entries take
    few distinct values and exact ties are pervasive; duplicate noise rows
    make entire cost columns identical. The auction must STILL return a
    valid permutation (the pre-repair code wrapped unconverged -1 owners to
    index n-1, silently duplicating/losing columns). Exact optimality is
    only guaranteed on generic instances (fp32 ε-increments are absorbed
    once ties freeze the prices — documented in auction_assignment); under
    these pathological exact ties the contract is: valid permutation, no
    worse than the greedy fallback, within a few percent of optimum."""
    from scipy.optimize import linear_sum_assignment

    from cmh_tpu.ops.hungarian import auction_assignment, greedy_assignment

    rng = np.random.RandomState(5)
    for trial in range(6):
        n, d = 24, 16
        codes = rng.choice([-1.0, 1.0], size=(n, d)).astype(np.float32)
        noises = rng.choice([-1.0, 1.0], size=(n, d)).astype(np.float32)
        noises[n // 2:] = noises[: n - n // 2]  # duplicated columns
        diff = codes[:, None, :] - noises[None, :, :]
        cost = np.sqrt(np.maximum((diff * diff).sum(-1), 0.0))
        col = np.asarray(auction_assignment(jnp.asarray(cost)))
        assert sorted(col.tolist()) == list(range(n)), f"trial {trial}: not a permutation"
        greedy = np.asarray(greedy_assignment(jnp.asarray(cost)))
        _, opt = linear_sum_assignment(cost.astype(np.float64))
        tot = lambda idx: cost[np.arange(n), idx].sum()
        assert tot(col) <= tot(greedy) + 1e-3, (trial, tot(col), tot(greedy))
        assert tot(col) <= tot(opt) * 1.03, (trial, tot(col), tot(opt))
