"""Native C++ image kernels: build, PIL parity, pipeline integration."""

import numpy as np
import pytest
from PIL import Image

from cmh_tpu import native
from cmh_tpu.data.transforms import CLIP_MEAN, CLIP_STD, eval_transform, normalize


@pytest.fixture(scope="module")
def lib_ok():
    ok = native.available()
    if not ok:
        pytest.skip("native toolchain unavailable")
    return ok


def _rand_img(h=48, w=64, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_native_resize_matches_pil_bicubic(lib_ok):
    arr = _rand_img()
    got = native.resize_normalize(arr, 32, native.BICUBIC, CLIP_MEAN, CLIP_STD)
    pil = Image.fromarray(arr).resize((32, 32), Image.BICUBIC)
    want = normalize(np.asarray(pil))
    # PIL rounds to uint8 between passes; the native path keeps doubles —
    # differences are bounded by ~1.5/255 per channel pre-normalization
    assert got.shape == want.shape == (32, 32, 3)
    diff = np.abs(got - want) * CLIP_STD  # back to [0,1] scale
    assert np.percentile(diff, 99) < 2.0 / 255, np.abs(diff).max()


def test_native_resize_matches_pil_bilinear_upscale(lib_ok):
    arr = _rand_img(h=16, w=16, seed=1)
    got = native.resize_normalize(arr, 32, native.BILINEAR, CLIP_MEAN, CLIP_STD)
    pil = Image.fromarray(arr).resize((32, 32), Image.BILINEAR)
    want = normalize(np.asarray(pil))
    diff = np.abs(got - want) * CLIP_STD
    assert np.percentile(diff, 99) < 2.0 / 255


def test_native_crop_resize_matches_pil(lib_ok):
    arr = _rand_img(h=40, w=50, seed=2)
    box = (5, 7, 20, 30)  # y, x, h, w
    got = native.crop_resize_normalize(
        arr, box, 16, native.BILINEAR, CLIP_MEAN, CLIP_STD
    )
    pil = Image.fromarray(arr).resize(
        (16, 16), Image.BILINEAR, box=(7, 5, 7 + 30, 5 + 20)
    )
    want = normalize(np.asarray(pil))
    diff = np.abs(got - want) * CLIP_STD
    assert np.percentile(diff, 99) < 2.0 / 255


def test_native_flip(lib_ok):
    arr = _rand_img(h=8, w=8, seed=3)
    flipped = native.resize_normalize(
        arr, 8, native.BILINEAR, CLIP_MEAN, CLIP_STD, flip=True
    )
    plain = native.resize_normalize(
        arr, 8, native.BILINEAR, CLIP_MEAN, CLIP_STD, flip=False
    )
    np.testing.assert_allclose(flipped, plain[:, ::-1], atol=1e-6)


def test_eval_transform_native_vs_pil_paths(lib_ok, monkeypatch):
    arr = _rand_img(h=37, w=53, seed=4)
    img = Image.fromarray(arr)
    native_out = eval_transform(img, 24)
    monkeypatch.setenv("CMH_TPU_NO_NATIVE", "1")
    pil_out = eval_transform(img, 24)
    diff = np.abs(native_out - pil_out) * CLIP_STD
    assert np.percentile(diff, 99) < 2.0 / 255
