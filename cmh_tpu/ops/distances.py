"""Set-wise distances (chamfer family) and the DCG-weighted triplet loss.

Re-implementation of /root/reference/models/DIMCH/distance/distance.py and
loss/triplet_loss.py (shared by UMoED's distance module). The reference
computes set similarities by tiling the (B·M × B·M) cosine matrix and
running 2-D max/LP pool windows over it; here the sets stay as (B, M, D)
tensors and the aggregation is einsum + max/logsumexp over the token axes —
the same numbers, without materializing pooling windows, and fully fusible
by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .metrics import generate_weight_sim


def _pair_sim(img: jax.Array, txt: jax.Array) -> jax.Array:
    """(B, M, D) × (C, N, D) → (B, C, M, N) cosine sims (inputs normalized)."""
    return jnp.einsum("bmd,cnd->bcmn", img, txt, preferred_element_type=jnp.float32)


def chamfer_similarity(img: jax.Array, txt: jax.Array, denominator: float = 2.0):
    """Cosine chamfer (reference chamfer_distance_cosine, distance.py:86-97):
    mean over img tokens of max over txt tokens + symmetric term."""
    sim = _pair_sim(img, txt)
    m, n = sim.shape[2], sim.shape[3]
    right = jnp.sum(jnp.max(sim, axis=3), axis=2)  # Σ_m max_n
    left = jnp.sum(jnp.max(sim, axis=2), axis=2)   # Σ_n max_m
    return (right / m + left / n) / denominator


def smooth_chamfer_similarity(
    img: jax.Array,
    txt: jax.Array,
    temperature: float = 16.0,
    temperature_txt_scale: float = 1.0,
    denominator: float = 2.0,
):
    """LSE-smoothed chamfer (reference smooth_chamfer_distance_cosine,
    distance.py:63-84)."""
    sim = _pair_sim(img, txt)
    m, n = sim.shape[2], sim.shape[3]
    t1 = temperature * temperature_txt_scale
    right = jnp.sum(jax.scipy.special.logsumexp(t1 * sim, axis=3), axis=2)
    left = jnp.sum(jax.scipy.special.logsumexp(temperature * sim, axis=2), axis=2)
    return (right / (m * t1) + left / (n * temperature)) / denominator


def max_similarity(img: jax.Array, txt: jax.Array):
    """Max over all token pairs (reference max_distance_cosine)."""
    return jnp.max(_pair_sim(img, txt), axis=(2, 3))


def avg_similarity(img: jax.Array, txt: jax.Array, alpha: float = 1.0,
                   beta: float = 0.0):
    """Sigmoid-averaged pairwise similarity (reference MPdistance,
    distance.py:11-20; its α/β live outside the registered module and are
    never trained — fixed at 1/0 here)."""
    sim = _pair_sim(img, txt)
    return jnp.mean(jax.nn.sigmoid(alpha * sim + beta), axis=(2, 3))


def setwise_similarity(img, txt, mode: str = "chamfer", denominator: float = 2.0,
                       temperature: float = 16.0,
                       temperature_txt_scale: float = 1.0):
    """Mode dispatch (reference SetwiseDistance.compute, distance.py:117-128)."""
    if "smooth" in mode:
        return smooth_chamfer_similarity(img, txt, temperature,
                                         temperature_txt_scale, denominator)
    if "chamfer" in mode:
        return chamfer_similarity(img, txt, denominator)
    if "max" in mode:
        return max_similarity(img, txt)
    if "avg" in mode:
        return avg_similarity(img, txt)
    raise ValueError(f"unknown setwise distance mode '{mode}'")


def cos_distance(source: jax.Array, target: jax.Array) -> jax.Array:
    """clamp(1 - cos, 0) pairwise (reference triplet_loss.py:7-12)."""
    s = source / jnp.maximum(jnp.linalg.norm(source, axis=-1, keepdims=True), 1e-8)
    t = target / jnp.maximum(jnp.linalg.norm(target, axis=-1, keepdims=True), 1e-8)
    return jnp.maximum(1.0 - s @ t.T, 0.0)


def weighted_triplet_loss(
    pairwise_dist: jax.Array,
    s_labels: jax.Array,
    t_labels: jax.Array = None,
    margin: float = 0.0,
    weighted: bool = True,
    reduction: str = "mean",
) -> jax.Array:
    """DCG-weighted all-triplets loss (reference TripletLoss.forward,
    triplet_loss.py:47-88): loss[a,p,n] = clamp(w·mask·(d_ap − d_an + m), 0),
    mask = pos(a,p)·(1−pos(a,n)), w = DCG-normalized sim(a,p) − sim(a,n);
    mean over triplets with loss > 1e-16."""
    if t_labels is None:
        t_labels = s_labels
    label_sim, weights = generate_weight_sim(s_labels, t_labels)
    ap = pairwise_dist[:, :, None]
    an = pairwise_dist[:, None, :]
    triplet = ap - an + margin
    mask = label_sim[:, :, None] * (1.0 - label_sim[:, None, :])
    w = (weights[:, :, None] - weights[:, None, :]) if weighted else 1.0
    triplet = jnp.maximum(w * mask * triplet, 0.0)
    if reduction == "sum":
        return jnp.sum(triplet)
    num_positive = jnp.sum((triplet > 1e-16).astype(jnp.float32))
    return jnp.sum(triplet) / (num_positive + 1e-16)


def mmd_rbf_loss(x: jax.Array, y: jax.Array, gamma: float = None) -> jax.Array:
    """MMD with exp(-γ‖·‖) kernel (reference DIMCH.py:160-173)."""
    if gamma is None:
        gamma = 1.0 / x.shape[-1]

    def k(a, b):
        from .metrics import euclidean_similarity

        return jnp.exp(-gamma * euclidean_similarity(a, b))

    return jnp.mean(k(x, x)) - 2.0 * jnp.mean(k(x, y)) + jnp.mean(k(y, y))


def batchwise_uniformity_loss(embs: jax.Array, num_embeds: int,
                              t: float = 20.0) -> jax.Array:
    """Diversity regularizer (reference DIMCH.py:176-187).

    The reference flattens the sets to (B·M, D) and broadcasts an (N, N, N)
    mask; algebraically each slice sums the SAME upper triangle of the full
    (N, N) RBF matrix and the final mean reproduces that single value — so
    the O(N³) tensor is pure waste. Computed here directly as
    sum(triu(rbf, 1)) / (M(M−1)/2), which is numerically identical.
    """
    if num_embeds == 1:
        return jnp.float32(0.0)
    from .metrics import euclidean_similarity

    flat = embs.reshape(-1, embs.shape[-1])
    rbf = jnp.exp(-t * euclidean_similarity(flat, flat) ** 2)
    upper = jnp.triu(rbf, k=1)
    return jnp.sum(upper) / (num_embeds * (num_embeds - 1) * 0.5)


def batchwise_uniformity_loss_per_sample(embs: jax.Array, num_embeds: int,
                                         t: float = 20.0) -> jax.Array:
    """UMoED's diversity regularizer (reference UMoED.py:268-279).

    Same source text as DIMCH's, but UMoED calls it with 3-D (B, M, D) sets
    (UMoED.py:317-318) where DIMCH pre-flattens to (B·M, D) (DIMCH.py:186,
    202) — torch.cdist then batches per sample, so only WITHIN-sample token
    pairs are penalised. The distinction matters: decoder query slots are
    shared across the batch, so cross-sample same-slot pairs are nearly
    identical and would dominate the flattened sum.
    """
    if num_embeds == 1:
        return jnp.float32(0.0)
    d2 = jnp.sum(
        jnp.square(embs[:, :, None, :] - embs[:, None, :, :]), axis=-1
    )                                               # (B, M, M)
    rbf = jnp.exp(-t * d2)
    m = embs.shape[1]
    upper = jnp.triu(jnp.ones((m, m), embs.dtype), k=1)
    per = jnp.sum(rbf * upper[None], axis=(1, 2)) / (
        num_embeds * (num_embeds - 1) * 0.5
    )
    return jnp.mean(per)
