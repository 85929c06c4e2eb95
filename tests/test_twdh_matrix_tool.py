"""TwDH transform-matrix tool: learns a lossless long→short pair mapping."""

import numpy as np

from cmh_tpu.ops.hash_centers import generate_hash_centers
from cmh_tpu.tools.twdh_matrix import (
    check,
    save_matrix_pkl,
    train_transform_matrix,
)


def test_matrix_tool_reaches_lossless(tmp_path):
    long_center = generate_hash_centers(4, 16, seed=3)
    short_center = generate_hash_centers(4, 4, seed=4)
    matrix, lossless = train_transform_matrix(
        long_center, short_center, epochs=30, steps_per_epoch=20,
        batch_size=32, lr=0.01, seed=0, logger=lambda *a: None,
    )
    assert matrix.shape == (32, 8)
    assert lossless, "tool failed to find a lossless matrix on a tiny problem"
    assert check(long_center, short_center, matrix)

    # artifact round-trips through the torch-pickle loader used by TwDH
    path = str(tmp_path / "16" / "4.pkl")
    save_matrix_pkl(matrix, path)
    from cmh_tpu.ops.hash_centers import load_center_file

    back = load_center_file(path)
    np.testing.assert_allclose(back, matrix, atol=1e-6)


def test_check_rejects_random_matrix():
    long_center = generate_hash_centers(4, 16, seed=3)
    short_center = generate_hash_centers(4, 4, seed=4)
    rng = np.random.RandomState(0)
    assert not check(long_center, short_center,
                     rng.randn(32, 8).astype(np.float32))
