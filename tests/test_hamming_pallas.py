import jax.numpy as jnp
import numpy as np
import pytest

from cmh_tpu.ops.hamming_pallas import (
    hamming_from_codes,
    hamming_packed,
    hamming_packed_reference,
)
from cmh_tpu.ops.hashing import pack_bits
from cmh_tpu.ops.metrics import calc_hamming_dist


@pytest.mark.parametrize("k_bits", [16, 64, 128])
def test_pallas_hamming_matches_dense(k_bits):
    rng = np.random.RandomState(0)
    q = rng.choice([-1.0, 1.0], size=(33, k_bits)).astype(np.float32)
    g = rng.choice([-1.0, 1.0], size=(170, k_bits)).astype(np.float32)
    # interpret=True: tests run on CPU; the same kernel compiles on TPU
    got = np.asarray(hamming_from_codes(jnp.asarray(q), jnp.asarray(g), interpret=True))
    want = np.asarray(calc_hamming_dist(jnp.asarray(q), jnp.asarray(g))).astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_pallas_hamming_matches_jnp_oracle():
    rng = np.random.RandomState(7)
    qp = rng.randint(0, 2**32, size=(9, 2), dtype=np.uint32)
    gp = rng.randint(0, 2**32, size=(21, 2), dtype=np.uint32)
    got = np.asarray(
        hamming_packed(jnp.asarray(qp), jnp.asarray(gp), interpret=True)
    )
    want = np.asarray(hamming_packed_reference(jnp.asarray(qp), jnp.asarray(gp)))
    np.testing.assert_array_equal(got, want)


def test_pallas_hamming_odd_sizes_and_padding():
    rng = np.random.RandomState(3)
    # K=40 exercises the packing pad path (40 -> 2 words with 24 pad bits)
    q = rng.choice([-1.0, 1.0], size=(5, 40)).astype(np.float32)
    g = rng.choice([-1.0, 1.0], size=(131, 40)).astype(np.float32)
    got = np.asarray(hamming_from_codes(jnp.asarray(q), jnp.asarray(g), interpret=True))
    want = (0.5 * (40 - q @ g.T)).astype(np.int32)
    np.testing.assert_array_equal(got, want)
    assert got.shape == (5, 131)


def test_pack_bits_pad_bits_are_zero():
    codes = jnp.ones((1, 33))
    packed = np.asarray(pack_bits(codes))
    assert packed[0, 0] == 0xFFFFFFFF
    assert packed[0, 1] == 1  # only bit 0 set, 31 pad bits zero


def test_dense_matmul_crossover_documented():
    """hamming_packed_mxu was retired (see hamming_from_codes docstring):
    for codes already unpacked the dense bf16 matmul path is the fast one —
    verify it computes the same distances the packed kernel does."""
    rng = np.random.RandomState(4)
    q = rng.choice([-1.0, 1.0], size=(19, 64)).astype(np.float32)
    g = rng.choice([-1.0, 1.0], size=(300, 64)).astype(np.float32)
    dense = np.asarray(calc_hamming_dist(jnp.asarray(q), jnp.asarray(g)))
    packed = np.asarray(
        hamming_from_codes(jnp.asarray(q), jnp.asarray(g), interpret=True)
    )
    np.testing.assert_array_equal(dense.astype(np.int32), packed)


def test_output_dtype_narrows_at_true_bit_count():
    """225–255-bit codes pack to 8 words (32·8 = 256) but every distance
    fits uint8 — the kernel is output-bandwidth-bound, so the true bit
    count (not the padded word width) must select the dtype."""
    import jax.numpy as jnp
    import numpy as np

    from cmh_tpu.ops.hamming_pallas import hamming_from_codes, hamming_packed
    from cmh_tpu.ops.hashing import pack_bits

    rng = np.random.RandomState(0)
    q = rng.choice([-1.0, 1.0], size=(4, 240)).astype(np.float32)
    g = rng.choice([-1.0, 1.0], size=(9, 240)).astype(np.float32)
    d = hamming_from_codes(jnp.asarray(q), jnp.asarray(g), interpret=True)
    assert d.dtype == jnp.uint8
    # without the hint, the padded width (256) must stay on the safe side
    d2 = hamming_packed(pack_bits(jnp.asarray(q)), pack_bits(jnp.asarray(g)),
                        interpret=True)
    assert d2.dtype == jnp.uint16
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d2))
