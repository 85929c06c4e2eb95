"""tools/real_parity preflight + table emit (VERDICT r2 item 3a).

Full training through the tool is exercised manually (it wraps the same
runner path as main.py, covered by test_e2e_dcmht / test_runner_paths);
these tests pin the archive-facing stages: container preflight against a
realistic replica layout, named failures on broken archives, and the
markdown table with published-number joins.
"""

import os

import numpy as np
import pytest
import scipy.io as scio
from PIL import Image

from cmh_tpu.tools.real_parity import (
    PUBLISHED, _canonical, emit_table, preflight,
)


@pytest.fixture(scope="module")
def replica_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity_tool")
    ds = root / "cocomini"
    ds.mkdir()
    imgdir = root / "imgs"
    imgdir.mkdir()
    rng = np.random.RandomState(3)
    n = 12
    paths = []
    for i in range(n):
        arr = rng.randint(0, 255, size=(40, 36, 3), dtype=np.uint8)
        p = str(imgdir / f"im{i:05d}.jpg")
        Image.fromarray(arr).save(p)
        paths.append(p + "  ")  # trailing pad spaces, real char-matrix style
    caps = np.asarray([[f"a photo number {i}"] * 5 for i in range(n)])
    scio.savemat(str(ds / "caption.mat"), {"caption": caps})
    scio.savemat(str(ds / "index.mat"), {"FAll": np.asarray(paths)})
    labels = np.zeros((n, 6), dtype=np.uint8)
    for i in range(n):
        labels[i, rng.choice(6, 2, replace=False)] = 1
    scio.savemat(str(ds / "label.mat"), {"LAll": labels})
    return str(ds)


FILES = {"caption": "caption.mat", "index": "index.mat",
         "label": "label.mat"}


def test_preflight_ok(replica_dir):
    report = preflight(replica_dir, FILES, resolution=32, max_word=12,
                       query_num=4, train_num=6)
    assert report["corpus_items"] == 12
    for split in ("query", "train", "retrieval"):
        assert "image(32, 32, 3)" in report[f"{split}_item0"]
        assert "label(6,)" in report[f"{split}_item0"]


def test_preflight_missing_file(replica_dir, tmp_path):
    with pytest.raises(AssertionError, match=r"\[preflight:index\]"):
        preflight(replica_dir, {**FILES, "index": "nope.mat"},
                  resolution=32, max_word=12, query_num=4, train_num=6)


def test_preflight_bad_key(replica_dir, tmp_path):
    bad = tmp_path / "ds"
    bad.mkdir()
    for f in ("caption.mat", "index.mat"):
        os.link(os.path.join(replica_dir, f), str(bad / f))
    scio.savemat(str(bad / "label.mat"), {"wrongkey": np.zeros((12, 6))})
    with pytest.raises(RuntimeError, match=r"\[preflight:label\].*category"):
        preflight(str(bad), FILES, resolution=32, max_word=12,
                  query_num=4, train_num=6)


def test_preflight_undersized_corpus(replica_dir):
    with pytest.raises(AssertionError, match=r"\[preflight:size\]"):
        preflight(replica_dir, FILES, resolution=32, max_word=12,
                  query_num=10, train_num=10)


def test_emit_table_joins_published(tmp_path):
    rows = [{
        "method": "DCMHT", "bits": 64,
        "ours": {"map_i2t": 0.7201, "map_t2i": 0.7149},
        "reference": {"map_i2t": 0.7239, "map_t2i": 0.7144},
    }]
    out = tmp_path / "t.md"
    emit_table(rows, "mscoco", str(out))  # alias → coco
    text = out.read_text()
    assert "0.0038 OK" in text
    pub = PUBLISHED[("DCMHT", "coco", 64)]
    assert f"{pub[0]:.4f}" in text and f"{pub[1]:.4f}" in text


def test_emit_table_no_published(tmp_path):
    rows = [{"method": "MITH", "bits": 32,
             "ours": {"map_i2t": 0.5, "map_t2i": 0.5}, "reference": None}]
    out = tmp_path / "t.md"
    emit_table(rows, "nuswide", str(out))
    line = [l for l in out.read_text().splitlines() if "MITH" in l][0]
    assert line.count("—") == 5  # ref×2, delta, published×2


def test_canonical_aliases():
    assert _canonical("MSCOCO") == "coco"
    assert _canonical("mirflickr25k") == "mirflickr"
    assert _canonical("NUS-WIDE") == "nuswide"
    assert _canonical("coco") == "coco"
