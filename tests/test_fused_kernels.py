"""Equivalence tests for the fused Pallas kernels (interpret mode on CPU).

The TPU compute path swaps XLA's attention/LayerNorm lowering for the
Pallas kernels in ops/{attention,layernorm}_pallas.py when
``fused_kernels_ok()`` holds. These tests pin the kernels (and their
custom_vjp backwards) to the einsum/flax math the parity suites validate
against the torch reference, so the TPU fast path and the CPU parity path
are provably the same function.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmh_tpu.ops.attention_pallas import fused_attention
from cmh_tpu.ops.layernorm_pallas import fused_layernorm


def _attn_oracle(q, k, v, scale, mask, kpm):
    lg = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                    preferred_element_type=jnp.float32)
    if mask is not None:
        lg = lg + mask[None, None]
    if kpm is not None:
        lg = jnp.where(kpm[:, None, None, :], -jnp.inf, lg)
    w = jax.nn.softmax(lg, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@pytest.mark.parametrize("b", [3, 8])
@pytest.mark.parametrize("masks", ["none", "mask", "kpm", "both"])
def test_fused_attention_matches_einsum(b, masks):
    h, s, hd = 2, 10, 8
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, s, hd), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, s, hd), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, s, hd), jnp.float32)
    scale = hd**-0.5
    mask = (jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)
            if masks in ("mask", "both") else None)
    kpm = None
    if masks in ("kpm", "both"):
        kpm = jnp.asarray(rng.rand(b, s) > 0.7).at[:, 0].set(False)

    out = fused_attention(q, k, v, scale, mask, kpm)
    ref = _attn_oracle(q, k, v, scale, mask, kpm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)

    g1 = jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(
            fused_attention(q, k, v, scale, mask, kpm))), (0, 1, 2)
    )(q, k, v)
    g2 = jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(
            _attn_oracle(q, k, v, scale, mask, kpm))), (0, 1, 2)
    )(q, k, v)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=5e-6)


def _ln_oracle(x, g, b):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(x), -1, keepdims=True) - jnp.square(mu), 0.0
    )
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * g + b


def test_fused_layernorm_matches_flax(monkeypatch):
    from cmh_tpu.ops import layernorm_pallas as lp

    monkeypatch.setattr(lp, "_BLOCK", 16)   # force ragged final blocks
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(7, 33, 96), jnp.float32) * 2 + 1
    g = jnp.asarray(rng.randn(96), jnp.float32)
    b = jnp.asarray(rng.randn(96), jnp.float32)

    np.testing.assert_allclose(
        np.asarray(fused_layernorm(x, g, b)), np.asarray(_ln_oracle(x, g, b)),
        atol=2e-6,
    )
    g1 = jax.grad(lambda x, g, b: jnp.sum(jnp.sin(fused_layernorm(x, g, b))),
                  (0, 1, 2))(x, g, b)
    g2 = jax.grad(lambda x, g, b: jnp.sum(jnp.sin(_ln_oracle(x, g, b))),
                  (0, 1, 2))(x, g, b)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-4)


def test_clip_forward_fused_vs_reference_path(monkeypatch):
    """Whole-tower check: the need_weights=False fused-attention branch and
    the fused LayerNorm produce the same encode outputs as the einsum/flax
    path (which the torch-golden tests validate)."""
    from cmh_tpu.models.clip.model import CLIP, CLIPConfig

    cfg = CLIPConfig.tiny()
    model = CLIP(cfg)
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    txt = jnp.asarray(rng.randint(1, 49405, (2, 16)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, txt)

    def encode():
        ic, it, _ = model.apply(variables, img, method=lambda m, x: m.encode_image(x))
        tc, tt, _, _ = model.apply(
            variables, txt, method=lambda m, t: m.encode_text(t))
        return np.asarray(ic), np.asarray(it), np.asarray(tc), np.asarray(tt)

    monkeypatch.setenv("CMH_TPU_FUSED", "0")
    ref = encode()
    monkeypatch.setenv("CMH_TPU_FUSED", "1")   # interpret-mode kernels on CPU
    fused = encode()
    for a, c in zip(fused, ref):
        np.testing.assert_allclose(a, c, atol=3e-5)


def test_train_step_under_fused_kernels(tmp_path, monkeypatch):
    """Full DCMHT train step with CMH_TPU_FUSED=1: the fused attention
    custom_vjp backward and fused LayerNorm run inside the real jitted
    train graph (interpret mode on CPU) and produce a finite loss that
    matches the einsum path."""
    import numpy as np
    from tests.util_methods import tiny_trainer

    import jax.numpy as jnp

    def one_step(flag, path):
        monkeypatch.setenv("CMH_TPU_FUSED", flag)
        tr = tiny_trainer(path, "DCMHT", "DCMHTTrainer",
                          model_extra={"hash_func": "softmax"}, batch=8)
        batch = next(iter(tr.train_loader))
        db = {k: jnp.asarray(v) for k, v in batch.items()}
        _, loss, _ = tr._train_step(tr.state, db)
        return float(loss)

    l_fused = one_step("1", tmp_path / "fused")
    l_ref = one_step("0", tmp_path / "ref")
    assert np.isfinite(l_fused)
    np.testing.assert_allclose(l_fused, l_ref, rtol=2e-4)
