"""fetch_assets: checksum-verified download + dataset staging (mock-tested,
no network — file:// URLs stand in for the OpenAI CDN).

Mirrors the reference's SHA256 discipline
(/root/reference/models/CLIP/clip.py:39-68): hash embedded in the URL path,
existing-file short-circuit, mismatch → hard failure. Ours additionally
streams the hash and lands files atomically (no corrupt file can ever sit
at the final path)."""

import hashlib
import json
import os
import sys

import numpy as np
import pytest
import scipy.io as scio

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cmh_tpu.tools.fetch_assets import (  # noqa: E402
    CLIP_URLS, _sha_from_url, download, main, stage_dataset,
)


def _make_asset(tmp_path, content: bytes, name="model.pt"):
    """Lay out <tmp>/<sha256>/<name> so a file:// URL carries its hash as
    the second-to-last path segment, exactly like the OpenAI CDN URLs."""
    sha = hashlib.sha256(content).hexdigest()
    d = tmp_path / "cdn" / sha
    d.mkdir(parents=True)
    (d / name).write_bytes(content)
    return f"file://{d / name}", sha


def test_sha_from_url_parses_reference_urls():
    for url in CLIP_URLS.values():
        sha = _sha_from_url(url)
        assert sha is not None and len(sha) == 64
    assert _sha_from_url("https://x.test/no/hash/here.pt") is None


def test_download_verifies_and_is_atomic(tmp_path):
    url, sha = _make_asset(tmp_path, b"weights-bytes" * 100)
    root = tmp_path / "out"
    path = download(url, str(root), progress=False)
    assert os.path.isfile(path)
    assert hashlib.sha256(open(path, "rb").read()).hexdigest() == sha
    assert not os.path.exists(path + ".part")

    # existing matching file short-circuits (poison the source to prove
    # the network is not touched)
    src = url[len("file://"):]
    os.unlink(src)
    assert download(url, str(root), progress=False) == path


def test_download_rejects_corruption(tmp_path):
    content = b"real-bytes" * 50
    url, _ = _make_asset(tmp_path, content)
    src = url[len("file://"):]
    with open(src, "wb") as f:
        f.write(b"tampered-bytes" * 50)
    root = tmp_path / "out"
    with pytest.raises(RuntimeError, match="SHA256 mismatch"):
        download(url, str(root), progress=False)
    # nothing corrupt left behind — neither final file nor temp
    assert not any(os.scandir(root))


def test_download_replaces_stale_local_file(tmp_path):
    url, sha = _make_asset(tmp_path, b"fresh" * 64)
    root = tmp_path / "out"
    root.mkdir()
    target = root / os.path.basename(url)
    target.write_bytes(b"stale")
    path = download(url, str(root), progress=False)
    assert hashlib.sha256(open(path, "rb").read()).hexdigest() == sha


def _make_archives(d):
    d.mkdir(parents=True, exist_ok=True)
    caps = np.asarray([["a cat"], ["a dog"], ["a bird"]], dtype=object)
    scio.savemat(str(d / "caption.mat"), {"caption": caps})
    scio.savemat(str(d / "index.mat"),
                 {"index": np.asarray([["img0.png"], ["img1.png"],
                                       ["img2.png"]])})
    scio.savemat(str(d / "label.mat"),
                 {"category": np.eye(3, dtype=np.int8)})


def test_stage_dataset_layout_and_manifest(tmp_path):
    src = tmp_path / "downloads"
    _make_archives(src)
    manifest = {
        name: hashlib.sha256((src / name).read_bytes()).hexdigest()
        for name in ("caption.mat", "index.mat", "label.mat")
    }
    report = stage_dataset(str(src), str(tmp_path / "data"), "coco",
                           manifest=manifest, preflight=True)
    for name in ("caption.mat", "index.mat", "label.mat"):
        staged = tmp_path / "data" / "coco" / name
        assert staged.is_file(), name
        assert report["files"][name]["staged"] == str(staged)
        assert report["files"][name]["sha256"] == manifest[name]
    # preflight resolved the real container keys through our loaders
    assert report["preflight"]["caption_rows"] == 3
    assert report["preflight"]["label_shape"] == [3, 3]


def test_stage_dataset_rejects_bad_manifest(tmp_path):
    src = tmp_path / "downloads"
    _make_archives(src)
    bad = {"caption.mat": "0" * 64}
    with pytest.raises(RuntimeError, match="SHA256 mismatch"):
        stage_dataset(str(src), str(tmp_path / "data"), "coco",
                      manifest=bad)


def test_stage_dataset_missing_file_is_named(tmp_path):
    src = tmp_path / "downloads"
    src.mkdir()
    with pytest.raises(FileNotFoundError, match="caption.mat"):
        stage_dataset(str(src), str(tmp_path / "data"), "coco")


def test_cli_dataset_roundtrip(tmp_path, capsys):
    src = tmp_path / "downloads"
    _make_archives(src)
    main(["dataset", "--src", str(src), "--data-root",
          str(tmp_path / "data"), "--dataset", "mirflickr", "--link"])
    out = json.loads(capsys.readouterr().out)
    assert out["dataset"] == "mirflickr"
    assert (tmp_path / "data" / "mirflickr" / "label.mat").exists()
