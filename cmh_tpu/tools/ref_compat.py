"""Shims for importing the torch reference framework in this image.

Used by the parity test suite and the epoch A/B benchmark (tools/epoch_ab.py).

The reference (/root/reference, read-only) imports three packages absent from
this image: ftfy (tokenizer text cleanup), xlrd (DSPH code table), and
torchvision (dataset transforms, CLIP preprocessing). These stubs provide
exactly the surface the reference touches — the transform stubs implement
real torchvision semantics for the deterministic eval pipeline (Resize/
ToTensor/Normalize), which is what the parity harness drives through both
frameworks.
"""

from __future__ import annotations

import contextlib
import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


@contextlib.contextmanager
def cuda_noop():
    """Temporarily make Tensor.cuda() a no-op — some reference modules
    hardcode .cuda() at construction (DIMCH MPdistance, distance.py:15)."""
    import torch

    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.Tensor.cuda = orig


def install_stubs() -> None:
    if "ftfy" not in sys.modules:
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda t: t  # harness captions are clean ASCII
        sys.modules["ftfy"] = ftfy

    if "xlrd" not in sys.modules:
        # emulate the three xlrd calls DSPH makes
        # (models/DSPH/DSPH.py:33-34: open_workbook(...).sheet_by_index(0)
        # .row(bits)[col].value) — backed by our extracted copy of the
        # workbook (cmh_tpu/models/dsph_codetable.json, values verified
        # cell-for-cell against the xlsx by the round-1 review)
        xlrd = types.ModuleType("xlrd")

        class _Cell:
            def __init__(self, value):
                self.value = value

        class _Sheet:
            def __init__(self, table):
                self._table = table  # {row index as str: [cell values]}

            def row(self, i):
                return [_Cell(v) for v in self._table.get(str(i), [])]

        class _Book:
            def __init__(self, table):
                self._sheet = _Sheet(table)

            def sheet_by_index(self, i):
                assert i == 0
                return self._sheet

        def open_workbook(path, *a, **k):
            import json
            import os

            table_path = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "..", "models",
                "dsph_codetable.json",
            )
            with open(table_path) as f:
                return _Book(json.load(f))

        xlrd.open_workbook = open_workbook
        sys.modules["xlrd"] = xlrd

    if "torchvision" not in sys.modules:
        import torch

        tv = types.ModuleType("torchvision")
        transforms = types.ModuleType("torchvision.transforms")

        class Compose:
            def __init__(self, ts):
                self.transforms = ts

            def __call__(self, x):
                for t in self.transforms:
                    x = t(x)
                return x

        class Resize:
            """torchvision Resize with a (h, w) size tuple on PIL input."""

            def __init__(self, size, interpolation=None):
                self.size = size if isinstance(size, (tuple, list)) else (size, size)
                from PIL import Image

                self.interpolation = (
                    interpolation if interpolation is not None else Image.BILINEAR
                )

            def __call__(self, img):
                h, w = self.size
                return img.resize((w, h), self.interpolation)

        class CenterCrop:
            def __init__(self, size):
                self.size = size if isinstance(size, (tuple, list)) else (size, size)

            def __call__(self, img):
                w, h = img.size
                th, tw = self.size
                x = int(round((w - tw) / 2.0))
                y = int(round((h - th) / 2.0))
                return img.crop((x, y, x + tw, y + th))

        class ToTensor:
            def __call__(self, img):
                arr = np.asarray(img, dtype=np.float32) / 255.0
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                return torch.from_numpy(arr.transpose(2, 0, 1).copy())

        class Normalize:
            def __init__(self, mean, std):
                self.mean = torch.tensor(mean).view(-1, 1, 1)
                self.std = torch.tensor(std).view(-1, 1, 1)

            def __call__(self, t):
                return (t - self.mean) / self.std

        class RandomHorizontalFlip:
            """Faithful-enough: consumes torch RNG like torchvision."""

            def __init__(self, p=0.5):
                self.p = p

            def __call__(self, img):
                from PIL import Image

                if float(torch.rand(1)) < self.p:
                    return img.transpose(Image.FLIP_LEFT_RIGHT)
                return img

        class RandomResizedCrop:
            """Deterministic stand-in (full-image resize). The parity
            harness replaces train transforms with the eval pipeline before
            any batch is drawn, so the random crop itself is never used."""

            def __init__(self, size, **kwargs):
                self.size = size if isinstance(size, (tuple, list)) else (size, size)

            def __call__(self, img):
                from PIL import Image

                h, w = self.size
                return img.resize((w, h), Image.BILINEAR)

        class InterpolationMode:
            BICUBIC = None
            BILINEAR = None

        for name, obj in [
            ("Compose", Compose), ("Resize", Resize), ("CenterCrop", CenterCrop),
            ("ToTensor", ToTensor), ("Normalize", Normalize),
            ("RandomHorizontalFlip", RandomHorizontalFlip),
            ("RandomResizedCrop", RandomResizedCrop),
            ("InterpolationMode", InterpolationMode),
        ]:
            setattr(transforms, name, obj)
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = transforms


def load_reference():
    """Import the reference package tree; returns its registry singleton.

    Idempotent — the reference registers classes into its own global registry
    on first import.
    """
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import models   # noqa: F401  (registers all reference model classes)
    import runners  # noqa: F401  (registers all reference runners)
    from common.register import registry as ref_registry

    return ref_registry
