"""Host-side image transforms (numpy/PIL), matching the reference pipeline.

The reference uses torchvision Compose pipelines
(/root/reference/dataset/transformer_dataset.py:34-45):
  train: RandomHorizontalFlip → RandomResizedCrop(R) → ToTensor → Normalize
  eval:  Resize((R,R), bicubic) → ToTensor → Normalize
with the CLIP normalization constants. These are host-side (CPU) ops feeding
the device pipeline; the implementations here mirror torchvision semantics
(same scale/ratio sampling for RandomResizedCrop, same interpolation modes)
on PIL images + numpy, emitting HWC float32 — the TPU-native conv layout.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def normalize(img: np.ndarray) -> np.ndarray:
    """HWC uint8 [0,255] or float [0,1] → normalized float32 HWC.

    Branches on dtype like torchvision ToTensor (integer → /255), not on a
    value heuristic — a nearly-black uint8 image must still be rescaled."""
    img = np.asarray(img)
    x = img.astype(np.float32)
    if np.issubdtype(img.dtype, np.integer):
        x = x / 255.0
    return (x - CLIP_MEAN) / CLIP_STD


def random_resized_crop(
    img: Image.Image,
    size: int,
    rng: np.random.RandomState,
    scale=(0.08, 1.0),
    ratio=(3.0 / 4.0, 4.0 / 3.0),
) -> Image.Image:
    """torchvision RandomResizedCrop.get_params semantics.

    Delegates the box sampling to ``sample_crop_box`` — the PIL and native
    paths must consume the RNG stream identically draw-for-draw, so there
    is exactly ONE implementation of the sampling loop."""
    width, height = img.size
    i, j, h, w = sample_crop_box(height, width, rng, scale, ratio)
    return img.resize((size, size), Image.BILINEAR, box=(j, i, j + w, i + h))


def sample_crop_box(height, width, rng, scale=(0.08, 1.0),
                    ratio=(3.0 / 4.0, 4.0 / 3.0)):
    """torchvision RandomResizedCrop.get_params: (y, x, h, w)."""
    area = height * width
    log_ratio = (np.log(ratio[0]), np.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = np.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        w = int(round(np.sqrt(target_area * aspect)))
        h = int(round(np.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            i = rng.randint(0, height - h + 1)
            j = rng.randint(0, width - w + 1)
            return i, j, h, w
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w, h = width, int(round(width / ratio[0]))
    elif in_ratio > ratio[1]:
        h, w = height, int(round(height * ratio[1]))
    else:
        w, h = width, height
    return (height - h) // 2, (width - w) // 2, h, w


def _use_native() -> bool:
    if os.environ.get("CMH_TPU_NO_NATIVE"):
        return False
    from .. import native

    return native.available()


def train_transform(
    img: Image.Image, size: int, rng: np.random.RandomState
) -> np.ndarray:
    """RandomHorizontalFlip(0.5) → RandomResizedCrop(size) → normalize.

    Uses the fused native C++ kernel (cmh_tpu/native) when available: one
    pass over the pixels instead of PIL flip + crop-resize + numpy
    normalize. The flip is applied before the crop like the reference's
    Compose order (transformer_dataset.py:37-38).
    """
    flip = bool(rng.rand() < 0.5)
    if _use_native():
        from .. import native

        arr = np.asarray(img.convert("RGB"), dtype=np.uint8)
        if flip:
            arr = arr[:, ::-1]
        box = sample_crop_box(arr.shape[0], arr.shape[1], rng)
        return native.crop_resize_normalize(
            arr, box, size, native.BILINEAR, CLIP_MEAN, CLIP_STD, flip=False
        )
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    img = random_resized_crop(img, size, rng)
    return normalize(np.asarray(img))


def eval_transform(img: Image.Image, size: int) -> np.ndarray:
    """Resize((size, size), bicubic) → normalize."""
    if _use_native():
        from .. import native

        arr = np.asarray(img.convert("RGB"), dtype=np.uint8)
        return native.resize_normalize(
            arr, size, native.BICUBIC, CLIP_MEAN, CLIP_STD
        )
    img = img.resize((size, size), Image.BICUBIC)
    return normalize(np.asarray(img))
