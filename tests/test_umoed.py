"""UMoED: SoftMoE parity vs torch oracle, pairwise distance parity, smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from cmh_tpu.models.umoed import SoftMoE, pairwise_set_distance

from util_methods import run_steps, tiny_trainer


def _torch_soft_moe(x, phi, w, b):
    """Literal torch re-execution of reference SoftMoE.forward
    (SoftMoe.py:160-205)."""
    x = torch.tensor(x)
    phi = torch.tensor(phi)
    w = torch.tensor(w)
    b = torch.tensor(b)
    logits = torch.einsum("bmd,dnp->bmnp", x, phi)
    dispatch = logits.softmax(dim=1)
    bsz, m = logits.shape[:2]
    combine = logits.flatten(2).softmax(dim=-1).reshape(logits.shape)
    xs = torch.einsum("bmd,bmnp->bnpd", x, dispatch)
    ys = torch.einsum("bnpd,nde->bnpe", xs, w) + b[None, :, None, :]
    return torch.einsum("bnpe,bmnp->bme", ys, combine).numpy()


def test_soft_moe_parity():
    rng = np.random.RandomState(0)
    B, M, D, N, P, E = 2, 5, 8, 3, 2, 6
    x = rng.randn(B, M, D).astype(np.float32)
    moe = SoftMoE(in_features=D, out_features=E, num_experts=N,
                  slots_per_expert=P)
    variables = moe.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = variables["params"]
    got = np.asarray(moe.apply(variables, jnp.asarray(x)))
    want = _torch_soft_moe(
        x, np.asarray(params["phi"]), np.asarray(params["expert_kernel"]),
        np.asarray(params["expert_bias"]),
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pairwise_set_distance_parity():
    rng = np.random.RandomState(1)
    img = rng.randn(3, 4, 8).astype(np.float32)
    txt = rng.randn(3, 4, 8).astype(np.float32)
    # torch oracle (reference distance/__init__.py:22-42), cosine + extreme
    ti = torch.softmax(torch.tensor(img) / 0.3, dim=-1)
    tt = torch.softmax(torch.tensor(txt) / 0.3, dim=-1)
    sim = torch.einsum("btl,ktl->btk", ti, tt).clamp(min=0)
    want = (1 - sim).mean(dim=1).numpy()
    got = np.asarray(
        pairwise_set_distance(jnp.asarray(img), jnp.asarray(txt), extreme=True,
                              t=0.3)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
    # euclidean mode: diag-slot mean of the token-wise cdist blocks
    db = torch.cdist(torch.tensor(img).reshape(-1, 8),
                     torch.tensor(txt).reshape(-1, 8))
    db = db.view(3, 4, 3, 4).permute(0, 2, 1, 3)
    mask = torch.diag(torch.ones(4))
    want_e = (db * mask).mean(-1).mean(-1).numpy()
    got_e = np.asarray(
        pairwise_set_distance(jnp.asarray(img), jnp.asarray(txt), mode="euclid")
    )
    np.testing.assert_allclose(got_e, want_e, atol=1e-4)


def test_umoed_train_smoke(tmp_path):
    tr = tiny_trainer(
        tmp_path, "UMoED", "UMoEDTrainer",
        model_extra={
            "hash_func": "linear_subspace", "merge_func": "concatenate",
            "setDim": 8, "MoE": True, "fusion": True, "num_experts": 2,
            "slots_per_expert": 2, "decoder_heads": 2, "decoder_layers": 1,
            "hidden_dim": 32, "dropout": 0.1, "extreme": True,
            "extreme_T": 0.3, "triplet": True, "distance_mode": "cosine",
            "distance": {"mode": "pairwise"},
            "chamfer": {"unif_alpha": 0.8, "token_triplet_margin": 0.1},
            "hash_pars": {"triplet_alpha": 1, "triplet_margin": 0.3},
        },
        output_dim=8,
        batch=8,
    )
    # vocab = 2^(8/8) = 2 → one bit per slot, codes already ±1
    losses = run_steps(tr, n=3)
    assert np.isfinite(losses).all()
    maps = tr.valid(epoch=0)
    assert all(0 <= m <= 1 for m in maps)
    import os

    mats = os.listdir(os.path.join(tr.save_dir, "mat_files"))
    assert "last.mat" in mats
    import scipy.io as scio

    mat = scio.loadmat(os.path.join(tr.save_dir, "mat_files", "last.mat"))
    assert "q_fus" in mat  # fusion buffer present in the schema
    assert set(np.unique(mat["q_img"])) <= {-1.0, 1.0}


def test_baseline_train_smoke(tmp_path):
    tr = tiny_trainer(tmp_path, "Baseline", "BaselineTrainer",
                      model_extra={"hash_func": "tanh", "quan_alpha": 0.001,
                                   "dropout": 0.1})
    losses = run_steps(tr, n=3)
    assert np.isfinite(losses).all()
    maps = tr.valid(epoch=0)
    assert all(0 <= m <= 1 for m in maps)


def test_soft_moe_encoder_layer_runs():
    from cmh_tpu.models.umoed import SoftMoEEncoderLayer

    layer = SoftMoEEncoderLayer(d_model=16, nhead=2, dim_feedforward=32,
                                num_experts=2, slots_per_expert=2)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 16), jnp.float32)
    kpm = jnp.zeros((2, 5), bool).at[0, 3:].set(True)
    variables = layer.init(jax.random.PRNGKey(0), x, kpm, train=False)
    out = layer.apply(variables, x, kpm, train=False)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
