"""Fused multi-head attention for short sequences (Pallas/TPU).

The CLIP towers here run at sequence lengths 50 (ViT-B/32 patches+cls) and
≤77 (text): per (batch, head) the whole q/k/v slab plus the (S, S) logits
fit in VMEM with room to spare, so no flash-style online softmax is needed —
one kernel invocation computes logits → softmax → weighted sum without ever
materialising the (B, H, S, S) probability tensor in HBM.

Why this exists: XLA lowers the einsum attention at these shapes into
per-head (50×64)@(64×50) batched dots (≈7% MXU utilisation), layout copies
for every head split/merge transpose, and a 30 MB fp32 softmax round-trip
per layer — measured 19.4 ms of a 28.5 ms ViT-B/32 forward at batch 256
(see CLAUDE.md round-2 notes). The kernel processes a block of NB batch
items (all heads) per grid step so the per-step overhead amortises across
NB·H head-attentions.

Semantics match ``models/clip/model.py:MultiHeadAttention`` (and through it
torch.nn.MultiheadAttention as the reference uses it, reference
models/CLIP/model.py:153-268): fp32 logits, optional additive (S, S) mask,
optional boolean key-padding mask (True = masked), fp32 softmax, probability
matrix cast to the compute dtype before the value contraction.

Training works through a ``jax.custom_vjp``: the backward kernel recomputes
the softmax in VMEM (cheaper than storing (B,H,S,S) probabilities) and emits
dq/dk/dv in the same single pass.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _attend(q, k, v, scale, mask, kpm_bias, h):
    """(NB·H, S, hd) q/k/v → (probabilities fp32, out fp32)."""
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale                                        # (NB·H, S, S)
    if mask is not None:
        logits = logits + mask[None, :, :]
    if kpm_bias is not None:
        # (NB, S) → broadcast over each batch item's heads and queries
        nb, s = kpm_bias.shape
        per = jnp.broadcast_to(
            kpm_bias[:, None, :], (nb, h, s)
        ).reshape(nb * h, 1, s)
        logits = logits + per
    w = jax.nn.softmax(logits, axis=-1)
    out = jax.lax.dot_general(
        w.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return w, out


def _fwd_kernel(scale, has_mask, has_kpm, *refs):
    if has_mask and has_kpm:
        q_ref, k_ref, v_ref, mask_ref, kpm_ref, o_ref = refs
    elif has_mask:
        q_ref, k_ref, v_ref, mask_ref, o_ref = refs
        kpm_ref = None
    elif has_kpm:
        q_ref, k_ref, v_ref, kpm_ref, o_ref = refs
        mask_ref = None
    else:
        q_ref, k_ref, v_ref, o_ref = refs
        mask_ref = kpm_ref = None

    nb, h, s, hd = q_ref.shape
    q = q_ref[...].reshape(nb * h, s, hd)
    k = k_ref[...].reshape(nb * h, s, hd)
    v = v_ref[...].reshape(nb * h, s, hd)
    mask = mask_ref[...].astype(jnp.float32) if mask_ref is not None else None
    kpm = (kpm_ref[...].astype(jnp.float32).reshape(nb, s)
           if kpm_ref is not None else None)
    _, out = _attend(q, k, v, scale, mask, kpm, h)
    o_ref[...] = out.reshape(nb, h, s, hd).astype(o_ref.dtype)


def _bwd_kernel(scale, has_mask, has_kpm, *refs):
    if has_mask and has_kpm:
        (q_ref, k_ref, v_ref, mask_ref, kpm_ref, do_ref,
         dq_ref, dk_ref, dv_ref) = refs
    elif has_mask:
        q_ref, k_ref, v_ref, mask_ref, do_ref, dq_ref, dk_ref, dv_ref = refs
        kpm_ref = None
    elif has_kpm:
        q_ref, k_ref, v_ref, kpm_ref, do_ref, dq_ref, dk_ref, dv_ref = refs
        mask_ref = None
    else:
        q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref = refs
        mask_ref = kpm_ref = None

    nb, h, s, hd = q_ref.shape
    q = q_ref[...].reshape(nb * h, s, hd)
    k = k_ref[...].reshape(nb * h, s, hd)
    v = v_ref[...].reshape(nb * h, s, hd)
    do = do_ref[...].reshape(nb * h, s, hd).astype(jnp.float32)
    mask = mask_ref[...].astype(jnp.float32) if mask_ref is not None else None
    kpm = (kpm_ref[...].astype(jnp.float32).reshape(nb, s)
           if kpm_ref is not None else None)
    w, _ = _attend(q, k, v, scale, mask, kpm, h)

    # dV = wᵀ @ dO (contract queries); dW = dO @ vᵀ; softmax VJP; chain q/k
    dv = jax.lax.dot_general(
        w, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dw = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dlog = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(
        dlog, k.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dk = jax.lax.dot_general(
        dlog, q.astype(jnp.float32), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dq_ref[...] = dq.reshape(nb, h, s, hd).astype(dq_ref.dtype)
    dk_ref[...] = dk.reshape(nb, h, s, hd).astype(dk_ref.dtype)
    dv_ref[...] = dv.reshape(nb, h, s, hd).astype(dv_ref.dtype)


def _pick_nb(b: int, cap: int = 8) -> int:
    for nb in (8, 4, 2):
        if nb <= cap and b % nb == 0:
            return nb
    return 1


def _specs(nb, h, s, hd, has_mask, has_kpm):
    per_blk = pl.BlockSpec((nb, h, s, hd), lambda i: (i, 0, 0, 0))
    specs = [per_blk, per_blk, per_blk]
    if has_mask:
        specs.append(pl.BlockSpec((s, s), lambda i: (0, 0)))
    if has_kpm:
        # the kpm rides as (B, 1, S) so the block's last two dims (1, S)
        # equal the array dims — Mosaic requires the last two block dims
        # be (8, 128)-divisible or full; a 2-D (nb, S) block breaks the
        # moment nb < 8 (the backward's VMEM cap, or any batch % 8 != 0)
        specs.append(pl.BlockSpec((nb, 1, s), lambda i: (i, 0, 0)))
    return per_blk, specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention(q, k, v, scale, mask, kpm):
    out, _ = _attention_fwd(q, k, v, scale, mask, kpm)
    return out


def _attention_fwd(q, k, v, scale, mask, kpm):
    b, h, s, hd = q.shape
    nb = _pick_nb(b)
    has_mask, has_kpm = mask is not None, kpm is not None
    per_blk, in_specs = _specs(nb, h, s, hd, has_mask, has_kpm)
    args = [q, k, v] + ([mask] if has_mask else []) + (
        [kpm.reshape(b, 1, s)] if has_kpm else [])
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale, has_mask, has_kpm),
        grid=(b // nb,),
        in_specs=in_specs,
        out_specs=per_blk,
        out_shape=jax.ShapeDtypeStruct((b, h, s, hd), q.dtype),
        interpret=_interpret(),
    )(*args)
    return out, (q, k, v, mask, kpm)


def _attention_bwd(scale, res, do):
    q, k, v, mask, kpm = res
    b, h, s, hd = q.shape
    # 7 double-buffered (nb,H,S,hd) blocks + three fp32 (nb·H,S,S)
    # intermediates: nb=8 exceeds the 16 MB scoped-vmem budget (measured
    # 19.8 MB on v5e) — the backward runs at half the forward's block
    nb = _pick_nb(b, cap=4)
    has_mask, has_kpm = mask is not None, kpm is not None
    per_blk, in_specs = _specs(nb, h, s, hd, has_mask, has_kpm)
    args = [q, k, v] + ([mask] if has_mask else []) + (
        [kpm.reshape(b, 1, s)] if has_kpm else [])
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale, has_mask, has_kpm),
        grid=(b // nb,),
        in_specs=in_specs + [per_blk],
        out_specs=[per_blk, per_blk, per_blk],
        out_shape=[jax.ShapeDtypeStruct((b, h, s, hd), q.dtype)] * 3,
        interpret=_interpret(),
    )(*args, do)
    dmask = jnp.zeros_like(mask) if mask is not None else None
    dkpm = jnp.zeros_like(kpm) if kpm is not None else None
    return dq, dk, dv, dmask, dkpm


_attention.defvjp(_attention_fwd, _attention_bwd)


def _interpret() -> bool:
    from .fused import interpret_mode

    return interpret_mode()


def fused_attention(
    q: jax.Array,                     # (B, H, S, hd)
    k: jax.Array,
    v: jax.Array,
    scale: float,
    attn_mask: Optional[jax.Array] = None,        # (S, S) additive
    key_padding_mask: Optional[jax.Array] = None,  # (B, S) bool, True = pad
) -> jax.Array:
    """softmax(scale·q@kᵀ + masks) @ v without materialising probabilities.

    Returns (B, H, S, hd) in q's dtype. Differentiable w.r.t. q/k/v; the
    boolean key-padding mask is converted to an additive -inf bias outside
    the custom_vjp so every residual has a well-defined (zero) cotangent.
    """
    if k.shape != q.shape or v.shape != q.shape:
        raise ValueError(
            "fused_attention is self-attention only (blocking assumes "
            f"S_kv == S_q): got q {q.shape}, k {k.shape}, v {v.shape}"
        )
    kpm_bias = None
    if key_padding_mask is not None:
        kpm_bias = jnp.where(
            key_padding_mask, -jnp.inf, 0.0
        ).astype(jnp.float32)                      # (B, S)
    return _attention(q, k, v, float(scale), attn_mask, kpm_bias)
