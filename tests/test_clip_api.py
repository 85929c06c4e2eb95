"""Standalone clip API: load() fallback configs and tokenize() parity."""

import numpy as np
import pytest

from cmh_tpu.models.clip import api


def test_available_models():
    assert "ViT-B/32" in api.available_models()


def test_tokenize_shapes_and_parity():
    out = api.tokenize(["a photo of a cat", "hello"])
    assert out.shape == (2, 77)
    assert out[0, 0] == 49406
    # EOT closes each sequence; zero-padding after
    eot0 = int(np.argmax(out[0] == 49407))
    assert np.all(out[0, eot0 + 1:] == 0)
    single = api.tokenize("a photo of a cat")
    np.testing.assert_array_equal(single[0], out[0])


def test_tokenize_truncation():
    long_text = " ".join(["word"] * 200)
    with pytest.raises(RuntimeError):
        api.tokenize(long_text, context_length=16)
    out = api.tokenize(long_text, context_length=16, truncate=True)
    assert out.shape == (1, 16)
    assert out[0, -1] == 49407


def test_load_unknown_name_rejected():
    with pytest.raises(AssertionError):
        api.load("ViT-H/99")
