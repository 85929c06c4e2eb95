"""TwDH: center-target ops parity vs torch oracles + train/valid smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from cmh_tpu.ops.hash_centers import (
    bce_probs,
    generate_hash_centers,
    hadamard_matrix,
    hash_center_multilabels,
    hash_convert,
    load_center_file,
)

from util_methods import run_steps, tiny_trainer


def _torch_hash_center_multilables(labels, centers, random_center):
    """Literal torch re-execution of reference hash_center_multilables
    (TwDH.py:192-214) with an injected random tie-break vector."""
    out = []
    for label in labels:
        one = (label == 1).nonzero().squeeze(1)
        mean = torch.mean(centers[one], dim=0)
        mean[mean < 0] = -1
        mean[mean > 0] = 1
        mean[mean == 0] = random_center[mean == 0]
        out.append(mean.view(1, -1))
    return torch.cat(out, 0)


def test_hash_center_multilabels_parity():
    rng = np.random.RandomState(0)
    centers = (rng.randint(0, 2, size=(6, 8)) * 2 - 1).astype(np.float32)
    labels = (rng.rand(5, 6) > 0.5).astype(np.float32)
    labels[0] = 0
    labels[0, 0] = 1
    # force a tie: two complementary centers both positive
    centers[1] = -centers[2]
    labels[1] = 0
    labels[1, 1] = labels[1, 2] = 1

    key = jax.random.PRNGKey(3)
    random_pm = (
        np.asarray(jax.random.randint(key, (8,), 0, 2), dtype=np.float32) * 2 - 1
    )
    want = _torch_hash_center_multilables(
        torch.tensor(labels), torch.tensor(centers), torch.tensor(random_pm)
    )
    got = hash_center_multilabels(
        jnp.asarray(labels), jnp.asarray(centers), key
    )
    np.testing.assert_array_equal(np.asarray(got), want.numpy())


def test_hash_convert_parity():
    h = jnp.asarray([[1.0, -1.0, 1.0], [-1.0, -1.0, 1.0]])
    got = np.asarray(hash_convert(h))
    # bit +1 → (0,1); bit −1 → (1,0); concatenated per bit
    want = np.asarray(
        [[0, 1, 1, 0, 0, 1], [1, 0, 1, 0, 0, 1]], dtype=np.float32
    )
    np.testing.assert_array_equal(got, want)


def test_bce_probs_matches_torch_bceloss():
    rng = np.random.RandomState(1)
    p = rng.rand(4, 6).astype(np.float32)
    t = (rng.rand(4, 6) > 0.5).astype(np.float32)
    want = float(torch.nn.BCELoss()(torch.tensor(p), torch.tensor(t)))
    got = float(bce_probs(jnp.asarray(p), jnp.asarray(t)))
    assert abs(got - want) < 1e-5

    # BOTH gradients match torch (the custom VJP must not silently
    # zero the target side — a loss differentiating through label-smoothing
    # targets would otherwise train wrong with no error)
    tp = torch.tensor(p, requires_grad=True)
    tt = torch.tensor(t, requires_grad=True)
    torch.nn.BCELoss()(tp, tt).backward()
    gp, gt = jax.grad(bce_probs, argnums=(0, 1))(
        jnp.asarray(p), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(gp), tp.grad.numpy(),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt), tt.grad.numpy(),
                               rtol=1e-4, atol=1e-6)


def test_hadamard_centers():
    h = hadamard_matrix(8)
    assert np.all(h @ h.T == 8 * np.eye(8))
    c = generate_hash_centers(10, 8)
    assert c.shape == (10, 8)
    assert set(np.unique(c)) <= {-1.0, 1.0}
    # distinct rows
    assert len({tuple(r) for r in c}) == 10


def test_load_reference_center_assets():
    c = load_center_file(
        "/root/reference/data/transformer/TwDH/coco/short/16.pkl"
    )
    assert c.shape == (80, 16)
    tr = load_center_file(
        "/root/reference/data/transformer/TwDH/coco/trans/512/16.pkl"
    )
    assert tr.shape == (1024, 32)


def test_twdh_train_and_valid_smoke(tmp_path):
    tr = tiny_trainer(
        tmp_path, "TwDH", "TwDHTrainer",
        model_extra={"hash_func": "softmax", "long_dim": 32,
                     "short_dims": [8], "numclass": 4,
                     "quan_alpha": 0.5, "low_rate": 0.1,
                     "long_center": str(tmp_path / "none"),
                     "short_center": str(tmp_path / "none"),
                     "trans_matrix": str(tmp_path / "none")},
        batch=8,
    )
    assert tr.method.short_dims == [8]
    losses = run_steps(tr, n=3)
    assert np.isfinite(losses).all()
    maps = tr.valid(epoch=0)
    assert all(0 <= m <= 1 for m in maps)
    import os

    mats = os.listdir(os.path.join(tr.save_dir, "mat_files"))
    assert any("short-8" in m for m in mats)
    assert any("long" in m for m in mats)


def test_center_functions_parity_vs_reference_module():
    """Runs the real reference hash_center_multilables / hash_convert
    (/root/reference/models/TwDH/TwDH.py:192-230). Labels are chosen with an
    odd number of positives per row so the reference's random tie-break
    vector is inert and the comparison is RNG-free."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ref_shims import load_reference

    load_reference()
    import torch

    from models.TwDH.TwDH import (
        hash_center_multilables as ref_centers,
        hash_convert as ref_convert,
    )

    rng = np.random.RandomState(4)
    centers = (rng.randint(0, 2, size=(6, 8)) * 2 - 1).astype(np.float32)
    labels = np.zeros((5, 6), dtype=np.float32)
    for i in range(5):
        pos = rng.choice(6, size=[1, 3][i % 2], replace=False)  # odd count
        labels[i, pos] = 1
    want = ref_centers(torch.tensor(labels), torch.tensor(centers)).numpy()
    got = np.asarray(hash_center_multilabels(
        jnp.asarray(labels), jnp.asarray(centers), jax.random.PRNGKey(0)
    ))
    np.testing.assert_array_equal(got, want)

    want_c = ref_convert(torch.tensor(want)).numpy()
    got_c = np.asarray(hash_convert(jnp.asarray(want)))
    np.testing.assert_array_equal(got_c, want_c)
