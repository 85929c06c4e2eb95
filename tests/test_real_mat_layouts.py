"""Replicas of the ACTUAL benchmark-archive .mat layouts, reference-in-loop.

The real coco / mirflickr / nuswide archives (absent from this image) are
DCHMT-era MATLAB exports whose containers differ from the clean arrays the
rest of the test-suite synthesizes: padded char matrices for multi-caption
items, (1,n)-oriented object cells, uint8/int16 label matrices, alternate
key names, and path-valued index matrices with trailing pad spaces
(reference dataset/builder.py:44-88, transformer_dataset.py:58-87).

Each replica here is fed IDENTICALLY to the reference's
``build_dataloader`` + ``Transformer_Dataset`` and to ours, and the split
plus per-item (image, token ids, padding mask, label) outputs are compared
— so when the real archives land, the loaders have already been proven on
their container shapes. Layouts the reference itself cannot read (deeply
nested cells, bytes) are ours-only robustness checks.
"""

import os
import sys

import numpy as np
import pytest
import scipy.io as scio
import torch
from PIL import Image

sys.path.insert(0, os.path.dirname(__file__))
from ref_shims import load_reference  # noqa: E402

from cmh_tpu.data.builder import build_dataloader, load_captions  # noqa: E402
from cmh_tpu.models.clip.tokenizer import SimpleTokenizer  # noqa: E402

RES = 32
MAX_WORDS = 12
SEED = 1814


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    """On-disk jpgs addressed by absolute path, as the real index.mat does."""
    root = tmp_path_factory.mktemp("real_layout_imgs")
    rng = np.random.RandomState(3)
    paths = []
    for i in range(20):
        arr = rng.randint(0, 255, size=(48, 40, 3), dtype=np.uint8)
        p = str(root / f"im{i:05d}.jpg")
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def _build_ref(ds_dir, cap_name="caption.mat", idx_name="index.mat"):
    ref_registry = load_reference()
    from dataset.builder import build_dataloader as ref_build

    np.random.seed(SEED)
    tok = ref_registry.get_tokenizer_class("clip_tokenizer")()
    train, query, retrieval = ref_build(
        captionFile=os.path.join(ds_dir, cap_name),
        indexFile=os.path.join(ds_dir, idx_name),
        labelFile=os.path.join(ds_dir, "label.mat"),
        imageResolution=RES, query_num=4, train_num=8,
        dataset_cls="transformer_dataset", tokenizer=tok, maxWords=MAX_WORDS,
    )
    # deterministic image path: eval transform everywhere
    train.transform = query.transform
    train.is_train = False
    return train, query, retrieval


def _build_ours(ds_dir, cap_name="caption.mat", idx_name="index.mat"):
    np.random.seed(SEED)
    train, query, retrieval = build_dataloader(
        captionFile=os.path.join(ds_dir, cap_name),
        indexFile=os.path.join(ds_dir, idx_name),
        labelFile=os.path.join(ds_dir, "label.mat"),
        imageResolution=RES, query_num=4, train_num=8,
        dataset_cls="transformer_dataset", tokenizer=SimpleTokenizer(),
        maxWords=MAX_WORDS,
    )
    train.is_train = False
    return train, query, retrieval


def _assert_item_parity(ref_ds, our_ds):
    assert len(ref_ds) == len(our_ds)
    for i in range(len(ref_ds)):
        r_img, r_cap, r_kpm, r_label, r_idx = ref_ds[i]
        o_img, o_cap, o_kpm, o_label, o_idx = our_ds[i]
        np.testing.assert_allclose(
            np.transpose(o_img, (2, 0, 1)), r_img.numpy(),
            atol=2e-6, err_msg=f"image {i}",
        )
        np.testing.assert_array_equal(o_cap, r_cap.numpy(), err_msg=f"cap {i}")
        np.testing.assert_array_equal(
            o_kpm.astype(bool), r_kpm.numpy().astype(bool)
        )
        np.testing.assert_array_equal(
            np.asarray(o_label, np.int64), r_label.numpy().astype(np.int64)
        )
        assert int(o_idx) == int(r_idx)


# ---------------------------------------------------------------------------
# coco replica: padded char matrix of 5 captions per item, float64 labels
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory, image_files):
    ds = tmp_path_factory.mktemp("coco_replica")
    n = len(image_files)
    # five captions per item; identical within an item so the random pick
    # (python `random` there, np.random here) cannot desynchronize the A/B
    caps = np.asarray([[f"a coco style photo number {i}"] * 5
                       for i in range(n)])
    assert caps.shape == (n, 5)
    scio.savemat(str(ds / "caption.mat"), {"caption": caps})
    scio.savemat(str(ds / "index.mat"), {"index": np.asarray(image_files)})
    labels = np.zeros((n, 80))
    rng = np.random.RandomState(5)
    for i in range(n):
        labels[i, rng.choice(80, size=rng.randint(1, 4), replace=False)] = 1
    scio.savemat(str(ds / "label.mat"), {"category": labels})
    return str(ds)


def test_coco_layout_item_parity(coco_dir):
    ref_sets = _build_ref(coco_dir)
    our_sets = _build_ours(coco_dir)
    for ref_ds, our_ds in zip(ref_sets, our_sets):
        _assert_item_parity(ref_ds, our_ds)


def test_coco_multicaption_pick_covers_all(coco_dir, tmp_path):
    """With distinct captions per item, the train-mode pick must reach every
    column (reference picks with random.randint over the row)."""
    n = 6
    caps = np.asarray([[f"item {i} caption {j}" for j in range(5)]
                       for i in range(n)])
    scio.savemat(str(tmp_path / "caption.mat"), {"caption": caps})
    loaded = load_captions(str(tmp_path / "caption.mat"))
    ds_rng = np.random.RandomState(0)
    from cmh_tpu.data.dataset import TransformerDataset

    ds = TransformerDataset(
        captions=loaded, indexs=np.zeros((n, 8, 8, 3), np.uint8),
        labels=np.eye(n), is_train=True, imageResolution=8,
        tokenizer=SimpleTokenizer(), maxWords=MAX_WORDS, npy=True, rng=ds_rng,
    )
    tok = SimpleTokenizer()
    per_caption_ids = {
        j: tuple(
            np.asarray(
                __import__("cmh_tpu.models.clip.tokenizer",
                           fromlist=["tokenize_caption"])
                .tokenize_caption(tok, f"item 0 caption {j}", MAX_WORDS)[0]
            ).tolist()
        )
        for j in range(5)
    }
    seen = set()
    for _ in range(100):
        _, cap, _, _, _ = ds[0]
        ids = tuple(np.asarray(cap).tolist())
        seen.add([j for j, v in per_caption_ids.items() if v == ids][0])
    assert seen == set(range(5))


# ---------------------------------------------------------------------------
# mirflickr replica: (1,n) object cell of single-string cells, uint8 labels
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mirflickr_dir(tmp_path_factory, image_files):
    ds = tmp_path_factory.mktemp("mirflickr_replica")
    n = len(image_files)
    cell = np.empty((1, n), dtype=object)
    for i in range(n):
        cell[0, i] = np.asarray([f"tags sky water portrait {i}"])
    scio.savemat(str(ds / "caption.mat"), {"caption": cell})
    scio.savemat(str(ds / "index.mat"), {"index": np.asarray(image_files)})
    labels = (np.arange(n)[:, None] % 3 == np.arange(24)[None, :] % 3)
    scio.savemat(str(ds / "label.mat"),
                 {"category": labels.astype(np.uint8)})
    return str(ds)


def test_mirflickr_layout_item_parity(mirflickr_dir):
    ref_sets = _build_ref(mirflickr_dir)
    our_sets = _build_ours(mirflickr_dir)
    for ref_ds, our_ds in zip(ref_sets, our_sets):
        _assert_item_parity(ref_ds, our_ds)


# ---------------------------------------------------------------------------
# nuswide replica: caption.txt lines + alternate mat keys (imgs / LAll)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def nuswide_dir(tmp_path_factory, image_files):
    ds = tmp_path_factory.mktemp("nuswide_replica")
    n = len(image_files)
    with open(ds / "caption.txt", "w") as f:
        for i in range(n):
            f.write(f"nuswide tag line number {i}\n")
    scio.savemat(str(ds / "index.mat"), {"imgs": np.asarray(image_files)})
    labels = np.zeros((n, 21), dtype=np.int16)
    labels[np.arange(n), np.arange(n) % 21] = 1
    scio.savemat(str(ds / "label.mat"), {"LAll": labels})
    return str(ds)


def test_nuswide_layout_item_parity(nuswide_dir):
    ref_sets = _build_ref(nuswide_dir, cap_name="caption.txt")
    our_sets = _build_ours(nuswide_dir, cap_name="caption.txt")
    for ref_ds, our_ds in zip(ref_sets, our_sets):
        _assert_item_parity(ref_ds, our_ds)


# ---------------------------------------------------------------------------
# ours-only robustness: layouts the reference itself cannot read
# ---------------------------------------------------------------------------

def test_nested_n1_cells_ours_only(tmp_path, image_files):
    """(n,1) cells whose entries are (1,k) object rows — the reference's
    ``len(captions[index])`` sees 1 and then hands an ndarray to its
    tokenizer (crash); ours unwraps nested containers to the first string."""
    n = 6
    cell = np.empty((n, 1), dtype=object)
    for i in range(n):
        inner = np.empty((1, 3), dtype=object)
        for j in range(3):
            inner[0, j] = np.str_(f"nested {i} cap {j}")
        cell[i, 0] = inner
    scio.savemat(str(tmp_path / "caption.mat"), {"caption": cell})
    loaded = load_captions(str(tmp_path / "caption.mat"))
    from cmh_tpu.data.dataset import TransformerDataset

    ds = TransformerDataset(
        captions=loaded, indexs=np.zeros((n, 8, 8, 3), np.uint8),
        labels=np.eye(n), is_train=False, imageResolution=8,
        tokenizer=SimpleTokenizer(), maxWords=MAX_WORDS, npy=True,
    )
    _, cap, kpm, _, _ = ds[2]
    tok_ref, _ = __import__(
        "cmh_tpu.models.clip.tokenizer", fromlist=["tokenize_caption"]
    ).tokenize_caption(SimpleTokenizer(), "nested 2 cap 0", MAX_WORDS)
    np.testing.assert_array_equal(cap, tok_ref)


def test_bytes_captions_ours_only(tmp_path):
    from cmh_tpu.data.dataset import TransformerDataset

    n = 4
    caps = np.asarray([[b"byte caption %d" % i] for i in range(n)],
                      dtype=object)
    ds = TransformerDataset(
        captions=caps, indexs=np.zeros((n, 8, 8, 3), np.uint8),
        labels=np.eye(n), is_train=False, imageResolution=8,
        tokenizer=SimpleTokenizer(), maxWords=MAX_WORDS, npy=True,
    )
    _, cap, _, _, _ = ds[1]
    tok_ref, _ = __import__(
        "cmh_tpu.models.clip.tokenizer", fromlist=["tokenize_caption"]
    ).tokenize_caption(SimpleTokenizer(), "byte caption 1", MAX_WORDS)
    np.testing.assert_array_equal(cap, tok_ref)
