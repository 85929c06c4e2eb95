"""One-off: validate the fused Pallas attention (fwd + custom-VJP bwd) on
the real TPU at the CLIP tower shapes — Mosaic must accept the block specs
(the battery's first CMH_TPU_FUSED=1 run died on a pre-fix (nb, S) key-
padding-mask block; interpret mode cannot prove the fix) — and A/B its
timing against the einsum lowering.

Run: python tools/validate_fused_attention_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from cmh_tpu.ops.attention_pallas import fused_attention


def einsum_ref(q, k, v, scale, mask, kpm):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = logits + mask[None, None]
    if kpm is not None:
        logits = jnp.where(kpm[:, None, None, :], -jnp.inf, logits)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def check(name, b, h, s, hd, with_mask, with_kpm, dtype):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, s, hd), dtype) * 0.1
    k = jnp.asarray(rng.randn(b, h, s, hd), dtype) * 0.1
    v = jnp.asarray(rng.randn(b, h, s, hd), dtype) * 0.1
    scale = hd ** -0.5
    mask = None
    if with_mask:  # causal, like the text tower
        m = np.full((s, s), -np.inf, np.float32)
        mask = jnp.asarray(np.triu(m, k=1))
    kpm = None
    if with_kpm:
        pad = rng.rand(b, s) > 0.8
        pad[:, 0] = False  # never mask everything
        kpm = jnp.asarray(pad)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, scale, mask, kpm)
                       .astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(einsum_ref(q, k, v, scale, mask, kpm)
                       .astype(jnp.float32) ** 2)

    got = jax.jit(jax.value_and_grad(loss_fused, argnums=(0, 1, 2)))(q, k, v)
    want = jax.jit(jax.value_and_grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    lerr = abs(float(got[0]) - float(want[0])) / max(abs(float(want[0])), 1.0)
    gerr = max(
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        for a, b in zip(got[1], want[1])
    )
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-4
    print(f"{name}: loss_rel_err={lerr:.2e} grad_max_err={gerr:.2e}")
    assert lerr < tol and gerr < tol, f"{name} diverges on TPU"


def time_fn(f, *args, iters=20):
    out = f(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    # force a data-dependent host fetch (trap #1: block_until_ready alone
    # does not reliably block on the tunnel backend)
    float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / iters


def main():
    print(f"backend: {jax.default_backend()}")
    # vision tower: B=256, 12 heads, S=50 (49 patches + cls), hd=64
    check("vision fp32", 64, 12, 50, 64, False, False, jnp.float32)
    check("vision bf16", 256, 12, 50, 64, False, False, jnp.bfloat16)
    # text tower: causal mask + key-padding mask, S=32 (max_word), hd=64
    check("text bf16 mask+kpm", 256, 8, 32, 64, True, True, jnp.bfloat16)
    check("text bf16 kpm", 256, 8, 32, 64, False, True, jnp.bfloat16)

    # timing A/B at the vision hot shape
    rng = np.random.RandomState(1)
    b, h, s, hd = 256, 12, 50, 64
    q = jnp.asarray(rng.randn(b, h, s, hd), jnp.bfloat16) * 0.1
    k = jnp.asarray(rng.randn(b, h, s, hd), jnp.bfloat16) * 0.1
    v = jnp.asarray(rng.randn(b, h, s, hd), jnp.bfloat16) * 0.1
    scale = hd ** -0.5

    def grad_of(fn):
        def loss(q, k, v):
            return jnp.sum(fn(q, k, v, scale, None, None)
                           .astype(jnp.float32) ** 2)
        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    t_fused = time_fn(grad_of(fused_attention), q, k, v)
    t_ref = time_fn(grad_of(einsum_ref), q, k, v)
    print(f"fwd+bwd per call (B=256 vision): fused={t_fused*1e3:.2f}ms "
          f"einsum={t_ref*1e3:.2f}ms ratio={t_ref/t_fused:.2f}x")


if __name__ == "__main__":
    main()
