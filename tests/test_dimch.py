"""DIMCH: set-distance/triplet parity vs torch oracles + train smoke."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from cmh_tpu.ops.distances import (
    batchwise_uniformity_loss,
    chamfer_similarity,
    cos_distance,
    mmd_rbf_loss,
    smooth_chamfer_similarity,
    weighted_triplet_loss,
)

from util_methods import run_steps, tiny_trainer


def _sets(b=3, m=4, d=6, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(b, m, d).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    return x


def _torch_chamfer(img, txt, mode, denominator=2.0, temperature=16.0, tts=1.0):
    """Literal torch pooling-based reference (distance.py:63-115)."""
    b, m, d = img.shape
    c, n, _ = txt.shape
    dist = torch.tensor(img.reshape(-1, d)) @ torch.tensor(txt.reshape(-1, d)).t()
    dist = dist.unsqueeze(0)
    if mode == "chamfer":
        x_max = torch.nn.MaxPool2d((1, n))(dist)
        right = torch.nn.LPPool2d(1, (m, 1))(x_max).squeeze(0)
        y_max = torch.nn.MaxPool2d((m, 1))(dist)
        left = torch.nn.LPPool2d(1, (1, n))(y_max).squeeze(0)
        return ((right / m + left / n) / denominator).numpy()
    x_sum = torch.nn.LPPool2d(1, (1, n))(torch.exp(temperature * tts * dist))
    right = torch.nn.LPPool2d(1, (m, 1))(torch.log(x_sum)).squeeze(0)
    y_sum = torch.nn.LPPool2d(1, (m, 1))(torch.exp(temperature * dist))
    left = torch.nn.LPPool2d(1, (1, n))(torch.log(y_sum)).squeeze(0)
    return ((right / (m * temperature * tts) + left / (n * temperature))
            / denominator).numpy()


def test_chamfer_similarity_parity():
    img, txt = _sets(seed=1), _sets(seed=2)
    got = np.asarray(chamfer_similarity(jnp.asarray(img), jnp.asarray(txt)))
    want = _torch_chamfer(img, txt, "chamfer")
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_smooth_chamfer_similarity_parity():
    img, txt = _sets(seed=3), _sets(seed=4)
    got = np.asarray(
        smooth_chamfer_similarity(jnp.asarray(img), jnp.asarray(txt))
    )
    want = _torch_chamfer(img, txt, "smooth")
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_chamfer_permutation_invariance():
    """Reference's own inline check (distance.py:127-183): permuting tokens
    within a set leaves the set distance unchanged."""
    img = _sets(seed=5)
    perm = img[:, [2, 0, 3, 1], :]
    a = np.asarray(smooth_chamfer_similarity(jnp.asarray(img), jnp.asarray(img)))
    b = np.asarray(smooth_chamfer_similarity(jnp.asarray(img), jnp.asarray(perm)))
    np.testing.assert_allclose(a, b, atol=1e-5)


def _torch_triplet(dist, labels, margin):
    """Literal torch re-execution of TripletLoss (triplet_loss.py:16-88)."""
    t = torch.tensor(labels)
    sim_origin = t.mm(t.t())
    sim = (sim_origin > 0).float()
    bsz = labels.shape[0]
    ph = torch.arange(0.0, bsz) + 2
    th = torch.log2(ph.repeat(1, bsz).reshape(bsz, bsz))
    ideal = torch.sort(sim_origin, dim=1, descending=True)[0]
    Z = (((2**ideal - 1) / th).sum(axis=1)).reshape(-1, 1)
    w_sim = (2**sim_origin - 1) / Z
    d = torch.tensor(dist)
    tri = d.unsqueeze(2) - d.unsqueeze(1) + margin
    mask = sim.unsqueeze(2) * (1 - sim.unsqueeze(1))
    weight = w_sim.unsqueeze(2) - w_sim.unsqueeze(1)
    tri = (weight * mask * tri).clamp(0)
    num_pos = tri.gt(1e-16).float().sum()
    return float(tri.sum() / (num_pos + 1e-16))


def test_weighted_triplet_loss_parity():
    rng = np.random.RandomState(6)
    labels = (rng.rand(8, 4) > 0.5).astype(np.float32)
    labels[:, 0] = 1
    labels[3] = 0
    labels[3, 1] = 1
    dist = np.abs(rng.randn(8, 8)).astype(np.float32)
    want = _torch_triplet(dist, labels, margin=0.3)
    got = float(
        weighted_triplet_loss(jnp.asarray(dist), jnp.asarray(labels), margin=0.3)
    )
    assert abs(got - want) < 1e-4


def test_cos_distance_parity():
    rng = np.random.RandomState(7)
    a = rng.randn(5, 8).astype(np.float32)
    b = rng.randn(5, 8).astype(np.float32)
    want = torch.clamp(
        1 - F.cosine_similarity(torch.tensor(a).unsqueeze(1), torch.tensor(b),
                                dim=-1), 0,
    ).numpy()
    got = np.asarray(cos_distance(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mmd_and_uniformity_sanity():
    x = _sets(seed=8).reshape(-1, 6)
    same = float(mmd_rbf_loss(jnp.asarray(x), jnp.asarray(x), gamma=0.5))
    assert abs(same) < 1e-6
    y = _sets(seed=9).reshape(-1, 6)
    assert float(mmd_rbf_loss(jnp.asarray(x), jnp.asarray(y), gamma=0.5)) > 0
    div = float(batchwise_uniformity_loss(jnp.asarray(_sets(seed=8)), 4))
    assert div > 0


def test_dimch_train_smoke(tmp_path):
    tr = tiny_trainer(
        tmp_path, "DIMCH", "DIMCHTrainer",
        model_extra={
            "hash_func": "tanh", "setDim": 4, "dropout": 0.1,
            "distance": {"mode": "smooth_chamfer"},
            "chamfer": {"mmd_alpha": 1.0, "unif_alpha": 0.3,
                        "token_triplet_margin": 0.3},
            "hash_pars": {"triplet_alpha": 50, "quan_alpha": 1.0,
                          "hash_triplet_alpha": 50, "triplet_margin": 0.3},
        },
        batch=8,
    )
    losses = run_steps(tr, n=3)
    assert np.isfinite(losses).all()
    maps = tr.valid(epoch=0)
    assert all(0 <= m <= 1 for m in maps)


# --------------------------------------- reference modules as oracles

def _ref():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ref_shims import load_reference

    load_reference()


def test_chamfer_parity_vs_reference_module():
    """Runs the real reference SetwiseDistance
    (/root/reference/models/DIMCH/distance/distance.py:21-125)."""
    _ref()
    import sys

    from ref_shims import cuda_noop

    from models.DIMCH.distance.distance import SetwiseDistance

    img, txt = _sets(seed=1), _sets(seed=2)
    b, m, d = img.shape
    c, n, _ = txt.shape
    with cuda_noop():
        ref = SetwiseDistance(img_set_size=m, txt_set_size=n,
                              denominator=2.0, temperature=16,
                              temperature_txt_scale=1, mode="chamfer")
    with torch.no_grad():
        want = ref.compute(
            torch.tensor(img.reshape(-1, d)), torch.tensor(txt.reshape(-1, d))
        ).numpy()
    got = np.asarray(chamfer_similarity(jnp.asarray(img), jnp.asarray(txt)))
    np.testing.assert_allclose(got, want, atol=1e-5)

    img, txt = _sets(seed=3), _sets(seed=4)
    with cuda_noop():
        ref = SetwiseDistance(img_set_size=m, txt_set_size=n,
                              denominator=2.0, temperature=16,
                              temperature_txt_scale=1, mode="smooth_chamfer")
    with torch.no_grad():
        want = ref.compute(
            torch.tensor(img.reshape(-1, d)), torch.tensor(txt.reshape(-1, d))
        ).numpy()
    got = np.asarray(
        smooth_chamfer_similarity(jnp.asarray(img), jnp.asarray(txt))
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_triplet_parity_vs_reference_module():
    """Runs the real reference TripletLoss
    (/root/reference/models/DIMCH/loss/triplet_loss.py:42-88)."""
    _ref()
    from models.DIMCH.loss.triplet_loss import TripletLoss

    rng = np.random.RandomState(6)
    labels = (rng.rand(8, 4) > 0.5).astype(np.float32)
    labels[:, 0] = 1
    labels[3] = 0
    labels[3, 1] = 1
    dist = np.abs(rng.randn(8, 8)).astype(np.float32)
    ref = TripletLoss(reduction="mean")
    with torch.no_grad():
        want = float(ref(
            source=torch.zeros(8, 4), s_labels=torch.tensor(labels),
            distance=torch.tensor(dist), margin=0.3,
        ))
    got = float(
        weighted_triplet_loss(jnp.asarray(dist), jnp.asarray(labels), margin=0.3)
    )
    assert abs(got - want) < 1e-4
