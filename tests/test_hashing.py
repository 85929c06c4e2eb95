import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmh_tpu.ops.hashing import (
    linear_subspace_hash,
    pack_bits,
    pair_argmax_code,
    sign_code,
    softmax_hash,
    tanh_hash,
    unpack_bits,
)


def test_softmax_hash_pairs_sum_to_one():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
    h = softmax_hash(x)
    assert h.shape == (4, 32)
    pairs = np.asarray(h).reshape(4, 16, 2)
    np.testing.assert_allclose(pairs.sum(-1), 1.0, atol=1e-6)
    # 3D input path
    h3 = softmax_hash(x.reshape(4, 16, 2), return_vector=False)
    np.testing.assert_allclose(np.asarray(h3).reshape(4, 32), np.asarray(h), atol=1e-6)


def test_tanh_hash_range():
    x = jnp.linspace(-5, 5, 11)
    h = tanh_hash(x)
    assert np.all(np.abs(np.asarray(h)) <= 1.0)


def test_linear_subspace_hash_matches_binary_expansion():
    # logits whose argmax is a known index -> code must be its binary ±1 expansion
    logits = np.full((2, 3, 16), -10.0, dtype=np.float32)
    picks = [[5, 0, 15], [9, 2, 7]]
    for b in range(2):
        for t in range(3):
            logits[b, t, picks[b][t]] = 10.0
    out = np.asarray(linear_subspace_hash(jnp.asarray(logits)))
    assert out.shape == (2, 12)

    def expand(i, bits=4):
        s = bin(i)[2:].zfill(bits)
        return [1.0 if c == "1" else -1.0 for c in s]

    expect = np.array(
        [sum((expand(i) for i in row), []) for row in picks], dtype=np.float32
    )
    np.testing.assert_array_equal(out, expect)


def test_linear_subspace_hash_rejects_bad_vocab():
    with pytest.raises(AssertionError):
        linear_subspace_hash(jnp.zeros((1, 2, 12)))  # 12 not a power of 2


def test_sign_and_pair_argmax_codes():
    x = jnp.asarray([[0.3, -0.2, 0.0, -1.0]])
    np.testing.assert_array_equal(np.asarray(sign_code(x)), [[1, -1, 1, -1]])
    soft = jnp.asarray([[0.9, 0.1, 0.2, 0.8]])  # pairs: (0.9,0.1)->-1, (0.2,0.8)->+1
    np.testing.assert_array_equal(np.asarray(pair_argmax_code(soft)), [[-1.0, 1.0]])


@pytest.mark.parametrize("k", [16, 32, 64, 100, 128])
def test_pack_unpack_roundtrip(k):
    rng = np.random.RandomState(0)
    codes = rng.choice([-1.0, 1.0], size=(7, k)).astype(np.float32)
    packed = pack_bits(jnp.asarray(codes))
    assert packed.shape == (7, -(-k // 32))
    back = np.asarray(unpack_bits(packed, k))
    np.testing.assert_array_equal(back, codes)


def test_packed_hamming_equals_dense():
    rng = np.random.RandomState(1)
    a = rng.choice([-1.0, 1.0], size=(5, 64)).astype(np.float32)
    b = rng.choice([-1.0, 1.0], size=(9, 64)).astype(np.float32)
    pa, pb = np.asarray(pack_bits(jnp.asarray(a))), np.asarray(pack_bits(jnp.asarray(b)))
    # XOR popcount on host as the oracle
    ham = np.zeros((5, 9))
    for i in range(5):
        for j in range(9):
            ham[i, j] = bin(int(pa[i, 0]) ^ int(pb[j, 0])).count("1") + bin(
                int(pa[i, 1]) ^ int(pb[j, 1])
            ).count("1")
    dense = 0.5 * (64 - a @ b.T)
    np.testing.assert_array_equal(ham, dense)
