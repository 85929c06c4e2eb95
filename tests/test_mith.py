"""MITH: component parity vs in-test torch oracles + train smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from cmh_tpu.models.mith import (
    bayesian_loss,
    info_nce_loss,
    info_nce_loss_bmm,
    localized_token_aggregation,
    sincos_positional_encoding,
)

from util_methods import run_steps, tiny_trainer


def _torch_lta(x_lnd, concept_lnk, top_k, key_padding_mask=None):
    """Literal torch re-execution of reference LTA (hash/hash.py:109-169)."""
    sim = concept_lnk.detach()
    if key_padding_mask is not None:
        key_pad = torch.where(key_padding_mask, float("-inf"), 0.0)
        key_pad = key_pad.unsqueeze(1).repeat(1, sim.shape[2], 1).permute(2, 0, 1)
        sim = sim + key_pad
    neg_inf = torch.full_like(sim, float("-inf"))
    sim = torch.where(sim > 0, sim, neg_inf)
    val = torch.topk(sim, k=top_k, dim=-1).values
    val_min = torch.min(val, dim=-1).values.unsqueeze(-1).repeat(1, 1, sim.shape[2])
    sim = torch.where(torch.ge(sim, val_min), sim, neg_inf)
    pseudo = torch.where(sim > 0, torch.ones_like(sim), torch.zeros_like(sim))
    soft = torch.softmax(sim, dim=0)
    soft = torch.where(torch.isnan(soft), torch.zeros_like(soft), soft)
    merged = torch.bmm(soft.permute(1, 2, 0), x_lnd.permute(1, 0, 2))  # NKD
    return merged, pseudo


def test_lta_parity_with_torch_reference():
    rng = np.random.RandomState(0)
    L, N, K, D = 7, 3, 5, 6
    x = rng.randn(L, N, D).astype(np.float32)
    concept = np.tanh(rng.randn(L, N, K)).astype(np.float32)
    kpm = np.zeros((N, L), dtype=bool)
    kpm[0, 5:] = True
    kpm[1, 3:] = True
    want_merged, want_pseudo = _torch_lta(
        torch.tensor(x), torch.tensor(concept), top_k=2,
        key_padding_mask=torch.tensor(kpm),
    )
    got_merged, got_pseudo = localized_token_aggregation(
        jnp.asarray(x.transpose(1, 0, 2)),       # N,L,D
        jnp.asarray(concept.transpose(1, 0, 2)),  # N,L,K
        top_k=2,
        key_padding_mask=jnp.asarray(kpm),
    )
    np.testing.assert_allclose(np.asarray(got_merged), want_merged.numpy(),
                               atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(got_pseudo), want_pseudo.permute(1, 0, 2).numpy()
    )


def test_bayesian_loss_parity():
    rng = np.random.RandomState(1)
    a = rng.randn(10, 8).astype(np.float32)
    b = rng.randn(4, 8).astype(np.float32)
    ls = (rng.rand(10, 4) > 0.5).astype(np.float32)
    ta, tb, tls = torch.tensor(a), torch.tensor(b), torch.tensor(ls)
    s = 0.5 * ta.mm(tb.t()).clamp(min=-64, max=64)
    want = float(-torch.mean(tls * s - torch.log(1 + torch.exp(s))))
    got = float(bayesian_loss(jnp.asarray(a), jnp.asarray(b), jnp.asarray(ls)))
    assert abs(got - want) < 1e-5


def test_info_nce_parity():
    rng = np.random.RandomState(2)
    o1 = rng.randn(6, 8).astype(np.float32)
    o2 = rng.randn(6, 8).astype(np.float32)
    t1, t2 = torch.tensor(o1), torch.tensor(o2)
    scores = t1.mm(t2.t()) / 0.07
    targets = torch.arange(6)
    want = float(0.5 * (F.cross_entropy(scores, targets)
                        + F.cross_entropy(scores.t(), targets)))
    got = float(info_nce_loss(jnp.asarray(o1), jnp.asarray(o2)))
    assert abs(got - want) < 1e-4


def test_info_nce_bmm_parity():
    rng = np.random.RandomState(3)
    K, N, D = 4, 3, 8
    o1 = rng.randn(K, N, D).astype(np.float32)
    o2 = rng.randn(K, N, D).astype(np.float32)
    t1 = torch.tensor(o1).permute(1, 0, 2)
    t2 = torch.tensor(o2).permute(1, 0, 2)
    sim = torch.bmm(t1, t2.permute(0, 2, 1)) / 0.07
    sim_1 = sim.reshape(N * K, K)
    sim_2 = sim.permute(0, 2, 1).reshape(N * K, K)
    targets = torch.arange(K).repeat(N)
    want = float(0.5 * (F.cross_entropy(sim_1, targets)
                        + F.cross_entropy(sim_2, targets)))
    got = float(info_nce_loss_bmm(
        jnp.asarray(o1.transpose(1, 0, 2)), jnp.asarray(o2.transpose(1, 0, 2))
    ))
    assert abs(got - want) < 1e-4


def test_positional_encoding_matches_torch_formula():
    import math

    d, L = 8, 5
    pe = sincos_positional_encoding(L, d)
    tpe = torch.zeros(L, d)
    position = torch.arange(0, L, dtype=torch.float).unsqueeze(1)
    div = torch.exp(torch.arange(0, d, 2).float() * (-math.log(10000.0) / d))
    tpe[:, 0::2] = torch.sin(position * div)
    tpe[:, 1::2] = torch.cos(position * div)
    tpe = tpe / (d**0.5)
    np.testing.assert_allclose(pe, tpe.numpy(), atol=1e-6)


def test_mith_train_smoke(tmp_path):
    tr = tiny_trainer(tmp_path, "MITH", "MITHTrainer",
                      model_extra={"hash_func": "tanh", "top_k_label": 3,
                                   "transformer_layers": 1,
                                   "res_mlp_layers": 1},
                      batch=8)
    # banks + train_labels in method_state
    assert set(tr.state.method_state) == {
        "img_cls", "txt_cls", "img_tokens", "txt_tokens", "train_labels"
    }
    losses = run_steps(tr, n=3)
    assert np.isfinite(losses).all()
    # bank rows for seen indices were updated away from the randn init
    maps = tr.valid(epoch=0)
    assert all(0 <= m <= 1 for m in maps)


def test_lta_parity_vs_reference_module():
    """Runs the real reference LocalizedTokenAggregation
    (/root/reference/models/MITH/hash/hash.py:109-169)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ref_shims import load_reference

    load_reference()
    from models.MITH.hash.hash import LocalizedTokenAggregation

    rng = np.random.RandomState(0)
    L, N, K, D = 7, 3, 5, 6
    x = rng.randn(L, N, D).astype(np.float32)
    concept = np.tanh(rng.randn(L, N, K)).astype(np.float32)
    kpm = np.zeros((N, L), dtype=bool)
    kpm[0, 5:] = True
    kpm[1, 3:] = True
    ref = LocalizedTokenAggregation(top_k=2)
    with torch.no_grad():
        want_merged, want_pseudo = ref(
            torch.tensor(x), torch.tensor(concept),
            key_padding_mask=torch.tensor(kpm),
        )  # returns KND, LNK
    got_merged, got_pseudo = localized_token_aggregation(
        jnp.asarray(x.transpose(1, 0, 2)),        # N,L,D
        jnp.asarray(concept.transpose(1, 0, 2)),  # N,L,K
        top_k=2,
        key_padding_mask=jnp.asarray(kpm),
    )
    np.testing.assert_allclose(
        np.asarray(got_merged), want_merged.permute(1, 0, 2).numpy(), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(got_pseudo), want_pseudo.permute(1, 0, 2).numpy()
    )
