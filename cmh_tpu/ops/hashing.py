"""Hash activation library (pure JAX, fully vectorized).

TPU-native re-implementation of the reference's hash activations
(/root/reference/models/common/hash.py:21-95):

- ``softmax_hash``: (B, 2K) logits → pairwise softmax over K (hi, lo) pairs.
- ``tanh_hash``: plain tanh relaxation.
- ``linear_subspace_hash``: per-token argmax over 2^m logits mapped to a
  precomputed ±1 codeword table. The reference materializes the codes with a
  python double loop over (batch, token); here it is a single table gather,
  which XLA lowers to one dynamic-gather — no host round-trip, no loop.

Binarization helpers used at eval time:

- ``sign_code``: tanh-style codes → ±1 (reference runners/base.py:407-410).
- ``pair_argmax_code``: softmax-pair codes → ±1 via argmax over each pair
  (reference runners/DCMHT/runner.py:82-95).
- ``pack_bits`` / ``unpack_bits``: ±1 ↔ packed uint32 lanes for the Pallas
  XOR+popcount Hamming kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SUPPORTED_SUBSPACE_BITS = (1, 2, 4, 8, 16)


def softmax_hash(embed: jax.Array, return_vector: bool = True) -> jax.Array:
    """Pairwise softmax relaxation.

    Accepts (B, 2K) or (..., K, 2); softmax over the trailing pair axis.
    """
    if embed.ndim == 2:
        embed = embed.reshape(embed.shape[0], -1, 2)
    else:
        assert embed.shape[-1] == 2, (
            f"softmax hash must input a shape of B,K,2. It is {embed.shape}"
        )
    probs = jax.nn.softmax(embed, axis=-1)
    if return_vector:
        return probs.reshape(probs.shape[0], -1)
    return probs


def tanh_hash(embed: jax.Array) -> jax.Array:
    return jnp.tanh(embed)


@functools.lru_cache(maxsize=None)
def _subspace_codebook(bits: int) -> np.ndarray:
    """±1 codeword table: row i = binary expansion of i, 0→-1, MSB first."""
    assert bits in SUPPORTED_SUBSPACE_BITS, (
        f"linear_subspace_hash only supports code sizes {SUPPORTED_SUBSPACE_BITS}, "
        f"got {bits}."
    )
    idx = np.arange(2**bits, dtype=np.uint32)
    shifts = np.arange(bits - 1, -1, -1, dtype=np.uint32)
    table = ((idx[:, None] >> shifts[None, :]) & 1).astype(np.float32)
    return table * 2.0 - 1.0


def linear_subspace_hash(logits: jax.Array) -> jax.Array:
    """(B, T, 2^m) logits → (B, T*m) ±1 codes via argmax + codebook gather."""
    batch, tokens, vocab = logits.shape
    bits = int(np.log2(vocab))
    assert 2**bits == vocab, f"vocab size {vocab} is not a power of two"
    table = jnp.asarray(_subspace_codebook(bits))
    keys = jnp.argmax(logits, axis=-1)            # (B, T) int
    codes = jnp.take(table, keys, axis=0)          # (B, T, bits)
    return codes.reshape(batch, tokens * bits)


def sign_code(code: jax.Array) -> jax.Array:
    """Continuous code → ±1 (zeros map to +1, unlike torch.sign; the
    reference uses in-place ``sign_`` whose 0→0 never occurs for tanh
    outputs in practice — we deterministically send 0→+1)."""
    return jnp.where(code >= 0, 1.0, -1.0).astype(code.dtype)


def pair_argmax_code(code: jax.Array) -> jax.Array:
    """Softmax-pair code (B, 2K) or (B, K, 2) → ±1 (B, K).

    Matches reference DCMHTTrainer.make_hash_code: argmax over each pair,
    0 → -1, 1 → +1.
    """
    if code.ndim == 2:
        code = code.reshape(code.shape[0], -1, 2)
    hard = jnp.argmax(code, axis=-1)
    return (hard.astype(jnp.float32) * 2.0 - 1.0)


def pack_bits(codes: jax.Array) -> jax.Array:
    """±1 codes (N, K) → packed uint32 (N, ceil(K/32)).

    Bit j of word w is set iff code[:, w*32 + j] > 0. K is zero-padded to a
    multiple of 32 (padding bits are 0 in BOTH operands, so they cancel in
    XOR-popcount Hamming distance).
    """
    n, k = codes.shape
    words = -(-k // 32)
    pad = words * 32 - k
    bits = (codes > 0).astype(jnp.uint32)
    if pad:
        bits = jnp.pad(bits, ((0, 0), (0, pad)))
    bits = bits.reshape(n, words, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return (bits << shifts).sum(axis=-1).astype(jnp.uint32)


def unpack_bits(packed: jax.Array, k: int) -> jax.Array:
    """Packed uint32 (N, W) → ±1 float codes (N, k)."""
    n, w = packed.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[:, :, None] >> shifts) & jnp.uint32(1)
    bits = bits.reshape(n, w * 32)[:, :k]
    return bits.astype(jnp.float32) * 2.0 - 1.0


def kaiming_uniform_fan_out(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Kaiming-uniform init with fan_out mode for Dense kernels.

    The reference initializes hash-head Linear layers with
    ``kaiming_uniform_(weight, mode='fan_out')`` and zero bias
    (models/common/hash.py:5-18). For a torch Linear weight (out, in),
    fan_out = out; our flax kernels are (in, out), so fan_out is shape[-1].
    gain for leaky_relu(a=sqrt(5))… torch default a=0 → gain=sqrt(2).
    bound = gain * sqrt(3 / fan_out).
    """
    fan_out = shape[-1]
    bound = np.sqrt(2.0) * np.sqrt(3.0 / fan_out)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
