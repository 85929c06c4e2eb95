"""Real data path: .mat/.txt/.npy loading, split parity with the reference,
and the full TransformerDataset → loader chain on generated files."""

import os

import numpy as np
import pytest
import scipy.io as scio
from PIL import Image

from cmh_tpu.data.builder import (
    build_dataloader,
    load_captions,
    load_indexs,
    load_labels,
    split_data,
)
from cmh_tpu.data.loader import HostDataLoader
from cmh_tpu.models.clip.tokenizer import SimpleTokenizer


def test_split_parity_with_reference_semantics():
    """Bit-identical split under the same numpy seed: query = first 5000',
    train = next, retrieval = everything after query (superset of train) —
    reference dataset/builder.py:9-32."""
    n = 200
    captions = np.asarray([[f"caption {i}"] for i in range(n)])
    indexs = np.asarray([f"/img/{i}.jpg" for i in range(n)])
    labels = np.eye(4)[np.arange(n) % 4]

    np.random.seed(1814)
    (qi, ti, ri), (qc, tc, rc), (ql, tl, rl) = split_data(
        captions, indexs, labels, query_num=50, train_num=100
    )
    # reproduce the reference's permutation consumption exactly
    np.random.seed(1814)
    perm = np.random.permutation(range(n))
    np.testing.assert_array_equal(qi, indexs[perm[:50]])
    np.testing.assert_array_equal(ti, indexs[perm[50:150]])
    np.testing.assert_array_equal(ri, indexs[perm[50:]])
    # retrieval ⊇ train (the reference quirk that must be preserved)
    assert set(ti.tolist()) <= set(ri.tolist())
    assert len(ri) == n - 50


@pytest.fixture(scope="module")
def mat_dataset_dir(tmp_path_factory):
    """Small on-disk dataset: caption.mat/index.mat/label.mat + jpg files."""
    root = tmp_path_factory.mktemp("matdata")
    n = 24
    rng = np.random.RandomState(0)
    img_dir = root / "imgs"
    os.makedirs(img_dir)
    paths = []
    for i in range(n):
        arr = rng.randint(0, 255, size=(40, 40, 3), dtype=np.uint8)
        p = str(img_dir / f"{i}.jpg")
        Image.fromarray(arr).save(p)
        paths.append(p)
    captions = np.asarray([[f"a photo number {i}"] for i in range(n)], dtype=object)
    labels = np.eye(4)[rng.randint(0, 4, n)].astype(np.float64)
    scio.savemat(str(root / "caption.mat"), {"caption": captions})
    # plain unicode array round-trips as a clean (n,) str array like the
    # real benchmark index.mat files
    scio.savemat(str(root / "index.mat"), {"index": np.asarray(paths)})
    scio.savemat(str(root / "label.mat"), {"category": labels})
    return root, n


def test_mat_loaders_key_fallbacks(mat_dataset_dir, tmp_path):
    root, n = mat_dataset_dir
    caps = load_captions(str(root / "caption.mat"))
    assert len(caps) == n
    idx, npy = load_indexs(str(root / "index.mat"))
    assert not npy and len(idx) == n
    labels = load_labels(str(root / "label.mat"))
    assert labels.shape == (n, 4)
    # alternate keys accepted (tags / imgs / labels)
    scio.savemat(str(tmp_path / "c.mat"), {"tags": np.ones((1, 5))})
    assert load_captions(str(tmp_path / "c.mat")).shape[0] == 5  # squeezed
    scio.savemat(str(tmp_path / "l.mat"), {"labels": np.ones((3, 2))})
    assert load_labels(str(tmp_path / "l.mat")).shape == (3, 2)
    # .txt captions path
    (tmp_path / "cap.txt").write_text("hello\nworld\n")
    caps_txt = load_captions(str(tmp_path / "cap.txt"))
    assert caps_txt.shape == (2, 1)
    with pytest.raises(RuntimeError):
        scio.savemat(str(tmp_path / "bad.mat"), {"wrongkey": np.ones((1, 1))})
        load_labels(str(tmp_path / "bad.mat"))


def test_end_to_end_mat_pipeline(mat_dataset_dir):
    root, n = mat_dataset_dir
    np.random.seed(1814)
    train, query, retrieval = build_dataloader(
        captionFile=str(root / "caption.mat"),
        indexFile=str(root / "index.mat"),
        labelFile=str(root / "label.mat"),
        imageResolution=32,
        query_num=6,
        train_num=10,
        dataset_cls="transformer_dataset",
        tokenizer=SimpleTokenizer(),
        maxWords=12,
    )
    assert len(query) == 6 and len(train) == 10 and len(retrieval) == n - 6
    image, caption, kpm, label, index = train[0]
    assert image.shape == (32, 32, 3) and image.dtype == np.float32
    assert caption.shape == (12,) and caption[0] == 49406
    assert label.shape == (4,)

    loader = HostDataLoader(train, batch_size=4, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["image"].shape == (4, 32, 32, 3)
        assert b["text"].shape == (4, 12)
    # last batch padded: 10 items → batches of 4,4,2(+2 pad)
    assert batches[-1]["valid"].sum() == 2
    # padding wraps *distinct* samples from the epoch's start, never copies
    # of the last item (duplicated rows would distort pairwise-similarity
    # losses in the final train step of non-divisible epochs)
    last = batches[-1]["index"]
    assert len(set(last.tolist())) == len(last)
    assert last[2] == batches[0]["index"][0] and last[3] == batches[0]["index"][1]


def test_npy_image_path(tmp_path):
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 255, size=(10, 24, 24, 3), dtype=np.uint8)
    np.save(str(tmp_path / "images.npy"), imgs)
    scio.savemat(str(tmp_path / "caption.mat"),
                 {"caption": np.asarray([[f"c{i}"] for i in range(10)], dtype=object)})
    scio.savemat(str(tmp_path / "label.mat"), {"LAll": np.eye(2)[np.arange(10) % 2]})
    np.random.seed(7)
    train, query, retrieval = build_dataloader(
        captionFile=str(tmp_path / "caption.mat"),
        indexFile=str(tmp_path / "images.npy"),
        labelFile=str(tmp_path / "label.mat"),
        imageResolution=16, query_num=2, train_num=4,
        dataset_cls="transformer_dataset", tokenizer=SimpleTokenizer(),
        maxWords=8,
    )
    img, cap, kpm, label, idx = query[0]
    assert img.shape == (16, 16, 3)


def test_loader_thread_pool_matches_serial(mat_dataset_dir):
    root, n = mat_dataset_dir
    np.random.seed(1814)
    train, _, _ = build_dataloader(
        captionFile=str(root / "caption.mat"), indexFile=str(root / "index.mat"),
        labelFile=str(root / "label.mat"), imageResolution=32, query_num=6,
        train_num=10, dataset_cls="transformer_dataset",
        tokenizer=SimpleTokenizer(), maxWords=12,
    )
    serial = HostDataLoader(train, batch_size=5, shuffle=False)
    pooled = HostDataLoader(train, batch_size=5, shuffle=False, num_workers=4)
    for a, b in zip(serial, pooled):
        # eval transform is deterministic → identical batches
        np.testing.assert_array_equal(a["text"], b["text"])
        np.testing.assert_array_equal(a["index"], b["index"])


def test_normalize_branches_on_dtype():
    """A nearly-black uint8 image must still be scaled by /255 (dtype branch,
    not a value heuristic); float inputs are assumed [0,1] already."""
    from cmh_tpu.data.transforms import CLIP_MEAN, CLIP_STD, normalize

    dark_u8 = np.ones((4, 4, 3), dtype=np.uint8)  # max pixel == 1
    out = normalize(dark_u8)
    expected = np.broadcast_to((1.0 / 255.0 - CLIP_MEAN) / CLIP_STD, out.shape)
    np.testing.assert_allclose(out, expected, rtol=1e-6)

    unit_float = np.full((4, 4, 3), 0.5, dtype=np.float32)
    out = normalize(unit_float)
    expected = np.broadcast_to((0.5 - CLIP_MEAN) / CLIP_STD, out.shape)
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_abandoned_loader_iterator_releases_worker(mat_dataset_dir):
    """`next(iter(loader))` shape probes abandon the generator; the prefetch
    worker must notice (stop event) instead of blocking on the full queue
    forever, pinning ~prefetch batches of memory per trainer construction."""
    import gc
    import threading
    import time

    root, _ = mat_dataset_dir
    np.random.seed(1814)
    train, _, _ = build_dataloader(
        captionFile=str(root / "caption.mat"),
        indexFile=str(root / "index.mat"),
        labelFile=str(root / "label.mat"),
        imageResolution=32,
        query_num=6,
        train_num=10,
        dataset_cls="transformer_dataset",
        tokenizer=SimpleTokenizer(),
        maxWords=12,
    )
    loader = HostDataLoader(train, batch_size=2, shuffle=False, prefetch=1)
    before = threading.active_count()
    for _ in range(8):
        it = iter(loader)
        next(it)
        del it
    gc.collect()
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        if threading.active_count() <= before + 1:
            break
        time.sleep(0.3)
    assert threading.active_count() <= before + 1, (
        f"{threading.active_count() - before} leaked prefetch workers"
    )


def test_synthetic_retrieval_superset_invariant():
    """The real split guarantees retrieval ⊇ train item-for-item; the
    synthetic dataset must honor it too: train (seed=1, n=train_num) and
    retrieval (seed=1, n=total-query) agree on images, labels AND captions
    for their shared prefix (everything keyed by (seed, index), never by
    stream position that shifts with num_items)."""
    from cmh_tpu.data.dataset import SyntheticDataset

    tok = SimpleTokenizer()
    kw = dict(num_classes=4, imageResolution=16, seed=1, tokenizer=tok,
              maxWords=12)
    small = SyntheticDataset(num_items=10, **kw)
    big = SyntheticDataset(num_items=30, **kw)
    np.testing.assert_array_equal(small._labels, big._labels[:10])
    assert (small.captions == big.captions[:10]).all()
    for i in (0, 3, 9):
        np.testing.assert_array_equal(small[i][0], big[i][0])
