"""BertAdam parity vs an in-test torch oracle replicating the reference
optimizer math (/root/reference/models/common/optimizer.py:102-166)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

from cmh_tpu.optim.bert_adam import bert_adam, build_lr_map, scheduled_lr_factor


def _torch_bert_adam_steps(params, grads_seq, lr, warmup, t_total, schedule,
                           b1, b2, e, wd, max_norm):
    """Literal torch re-execution of the reference step loop."""
    import math

    def sched(x):
        if schedule == "warmup_cosine":
            return x / warmup if x < warmup else 0.5 * (1 + math.cos(math.pi * x))
        if schedule == "warmup_constant":
            return x / warmup if x < warmup else 1.0
        return x / warmup if x < warmup else max((x - 1.0) / (warmup - 1.0), 0)

    ps = [torch.tensor(p, dtype=torch.float64) for p in params]
    ms = [torch.zeros_like(p) for p in ps]
    vs = [torch.zeros_like(p) for p in ps]
    step = 0
    for grads in grads_seq:
        for i, g_np in enumerate(grads):
            g = torch.tensor(g_np, dtype=torch.float64)
            if max_norm > 0:
                norm = g.norm()
                coef = max_norm / (norm + 1e-6)
                if coef < 1:
                    g = g * coef
            ms[i] = b1 * ms[i] + (1 - b1) * g
            vs[i] = b2 * vs[i] + (1 - b2) * g * g
            upd = ms[i] / (vs[i].sqrt() + e)
            if wd > 0:
                upd = upd + wd * ps[i]
            lr_sched = lr * sched(step / t_total) if t_total != -1 else lr
            ps[i] = ps[i] - lr_sched * upd
        step += 1
    return [p.numpy() for p in ps]


def test_bert_adam_matches_reference_math():
    rng = np.random.RandomState(0)
    p0 = [rng.randn(4, 3).astype(np.float32), rng.randn(5).astype(np.float32)]
    grads_seq = [
        [rng.randn(4, 3).astype(np.float32) * 3, rng.randn(5).astype(np.float32) * 0.1]
        for _ in range(6)
    ]
    kw = dict(lr=0.01, warmup=0.3, t_total=10, schedule="warmup_cosine",
              b1=0.9, b2=0.98, e=1e-6)
    want = _torch_bert_adam_steps(p0, grads_seq, wd=0.05, max_norm=1.0, **kw)

    tx = bert_adam(weight_decay=0.05, max_grad_norm=1.0, **kw)
    params = {"a": jnp.asarray(p0[0]), "b": jnp.asarray(p0[1])}
    state = tx.init(params)
    for grads in grads_seq:
        g = {"a": jnp.asarray(grads[0]), "b": jnp.asarray(grads[1])}
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["a"]), want[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(params["b"]), want[1], atol=1e-5)


def test_schedule_shapes():
    # warmup region is linear; end of cosine schedule approaches 0
    f0 = float(scheduled_lr_factor(0, 100, "warmup_cosine", 0.1))
    f5 = float(scheduled_lr_factor(5, 100, "warmup_cosine", 0.1))
    f100 = float(scheduled_lr_factor(100, 100, "warmup_cosine", 0.1))
    assert f0 == 0.0
    assert abs(f5 - 0.5) < 1e-6
    assert abs(f100 - 0.0) < 1e-6
    assert float(scheduled_lr_factor(50, 100, "warmup_constant", 0.1)) == 1.0
    assert float(scheduled_lr_factor(7, -1)) == 1.0


def test_per_leaf_lr_map():
    params = {"backbone": {"w": jnp.ones((2,))}, "hash": {"w": jnp.ones((2,))}}
    lr_map = build_lr_map(params, base_lr=0.1, overrides={"backbone": 0.001})
    tx = bert_adam(lr=0.1, lr_map=lr_map, weight_decay=0.0, max_grad_norm=-1)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # update magnitude ratio equals lr ratio (same grads/moments)
    ratio = float(updates["hash"]["w"][0] / updates["backbone"]["w"][0])
    assert abs(ratio - 100.0) < 1e-3


def test_per_param_clipping_is_independent():
    # one leaf has a huge grad, the other tiny: only the huge one is clipped
    params = {"big": jnp.zeros((2,)), "small": jnp.zeros((2,))}
    tx = bert_adam(lr=1.0, weight_decay=0.0, max_grad_norm=1.0, b1=0.0, b2=0.0,
                  e=0.0)
    state = tx.init(params)
    grads = {"big": jnp.asarray([30.0, 40.0]), "small": jnp.asarray([0.3, 0.4])}
    updates, _ = tx.update(grads, state, params)
    # big clipped to unit norm -> normalized direction; m=g, v=g^2 (b1=b2=0)
    # update = m/sqrt(v) = sign(g) => both leaves become ±1 direction... so
    # instead verify via moments: use b2=0 -> v=g². m/(sqrt(v)) = sign. To see
    # clipping, check with e large so update ≈ m/e.
    tx2 = bert_adam(lr=1.0, weight_decay=0.0, max_grad_norm=1.0, b1=0.0, b2=0.0,
                    e=1e9)
    state2 = tx2.init(params)
    u2, _ = tx2.update(grads, state2, params)
    big = np.asarray(u2["big"]) * -1e9
    small = np.asarray(u2["small"]) * -1e9
    np.testing.assert_allclose(np.linalg.norm(big), 1.0, rtol=1e-4)
    np.testing.assert_allclose(small, [0.3, 0.4], rtol=1e-4)


def test_flat_matches_tree_path():
    """The flattened fast path (flat=True) is the same function as the tree
    path: multi-step trajectories agree to fp32 reduction-order noise on a
    nested tree with ragged leaf sizes (incl. a scalar and a _CHUNK-aligned
    leaf)."""
    rng = np.random.RandomState(3)
    params = {
        "backbone": {
            "w": jnp.asarray(rng.randn(37, 19), jnp.float32),
            "big": jnp.asarray(rng.randn(512), jnp.float32),
            "nested": {"b": jnp.asarray(rng.randn(7), jnp.float32)},
        },
        "hash": {"k": jnp.asarray(rng.randn(3, 3, 3), jnp.float32),
                 "s": jnp.asarray(rng.randn(), jnp.float32),
                 "empty": jnp.zeros((0, 5), jnp.float32)},
    }
    kw = dict(lr=0.02, warmup=0.2, t_total=8, schedule="warmup_cosine",
              b1=0.9, b2=0.98, e=1e-6, weight_decay=0.1, max_grad_norm=1.0)
    tx_tree = bert_adam(flat=False, **kw)
    tx_flat = bert_adam(flat=True, **kw)
    pt = jax.tree_util.tree_map(lambda x: x, params)
    pf = jax.tree_util.tree_map(lambda x: x, params)
    st, sf = tx_tree.init(pt), tx_flat.init(pf)
    for i in range(5):
        g = jax.tree_util.tree_map(
            lambda x: jnp.asarray(
                rng.standard_normal(x.shape) * (10.0 if i % 2 else 0.01),
                jnp.float32),
            params)
        ut, st = tx_tree.update(g, st, pt)
        uf, sf = tx_flat.update(g, sf, pf)
        pt = optax.apply_updates(pt, ut)
        pf = optax.apply_updates(pf, uf)
    for a, b in zip(jax.tree_util.tree_leaves(pt), jax.tree_util.tree_leaves(pf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-7)


def test_flat_matches_reference_math():
    """flat=True against the fp64 torch oracle of the reference optimizer."""
    rng = np.random.RandomState(4)
    p0 = [rng.randn(4, 3).astype(np.float32), rng.randn(5).astype(np.float32)]
    grads_seq = [
        [rng.randn(4, 3).astype(np.float32) * 3,
         rng.randn(5).astype(np.float32) * 0.1]
        for _ in range(6)
    ]
    kw = dict(lr=0.01, warmup=0.3, t_total=10, schedule="warmup_cosine",
              b1=0.9, b2=0.98, e=1e-6)
    want = _torch_bert_adam_steps(p0, grads_seq, wd=0.05, max_norm=1.0, **kw)

    tx = bert_adam(weight_decay=0.05, max_grad_norm=1.0, flat=True, **kw)
    params = {"a": jnp.asarray(p0[0]), "b": jnp.asarray(p0[1])}
    state = tx.init(params)
    for grads in grads_seq:
        g = {"a": jnp.asarray(grads[0]), "b": jnp.asarray(grads[1])}
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["a"]), want[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(params["b"]), want[1], atol=1e-5)
