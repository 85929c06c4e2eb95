"""Fetch / stage the real-data assets so parity runs are one command.

The reference needs two external asset groups it does not ship
(README.md:70-75, 120):

* the pretrained CLIP checkpoint — fetched by the reference with SHA256
  verification baked into the URL path
  (/root/reference/models/CLIP/clip.py:39-68);
* the benchmark ``.mat`` archives (coco / mirflickr / nuswide caption,
  index, label files) — distributed via a cloud drive, no stable
  programmatic URL, so they arrive as local files.

This tool mirrors that split: ``clip`` downloads a checkpoint from the
public OpenAI URLs with streaming SHA256 verification (hash computed while
downloading, temp file + atomic rename — strictly stronger than the
reference's read-back check); ``dataset`` stages locally-obtained archives
into the layout ``tools/real_parity.py`` expects
(``<data-root>/<dataset>/{caption,index,label}.mat``), verifying each
against an optional SHA256 manifest and optionally preflighting the
container keys through our loaders.

Usage::

    python -m cmh_tpu.tools.fetch_assets clip --model ViT-B/32 --root .
    python -m cmh_tpu.tools.fetch_assets dataset \
        --src /downloads/coco_mats --data-root ./data/transformer \
        --dataset coco [--manifest sha256.json] [--preflight]

The moment the environment provides network + data, real parity is::

    python -m cmh_tpu.tools.fetch_assets clip --root .
    python -m cmh_tpu.tools.fetch_assets dataset --src ... --dataset coco \
        --data-root ./data/transformer --preflight
    python -m cmh_tpu.tools.real_parity --data-root ./data/transformer \
        --dataset coco --clip-path ./ViT-B-32.pt --methods DCMHT
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import urllib.request

# public OpenAI CLIP checkpoint URLs; the SHA256 of each file is the
# second-to-last path segment (same convention the reference relies on,
# models/CLIP/clip.py:30-37)
CLIP_URLS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "RN50x4": "https://openaipublic.azureedge.net/clip/models/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt",
    "RN50x16": "https://openaipublic.azureedge.net/clip/models/52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
}

_ARCHIVE_FILES = ("caption.mat", "index.mat", "label.mat")


def _file_sha256(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            buf = f.read(chunk)
            if not buf:
                break
            h.update(buf)
    return h.hexdigest()


def _sha_from_url(url: str):
    """The reference convention: SHA256 is the second-to-last path segment
    when it looks like one (64 hex chars)."""
    parts = url.rstrip("/").split("/")
    if len(parts) >= 2:
        cand = parts[-2].lower()
        if len(cand) == 64 and all(c in "0123456789abcdef" for c in cand):
            return cand
    return None


def download(url: str, root: str, expected_sha256: str = None,
             progress: bool = True) -> str:
    """Download ``url`` into ``root`` with SHA256 verification.

    The expected hash comes from ``expected_sha256`` or, failing that, the
    URL path (reference convention). An existing file that already matches
    is returned without touching the network; a mismatching one is
    re-downloaded. The hash is computed over the stream while downloading
    and the file lands via temp + atomic rename, so a partially-written or
    corrupt file can never sit at the final path.
    """
    os.makedirs(root, exist_ok=True)
    filename = os.path.basename(url)
    expected = (expected_sha256 or _sha_from_url(url) or "").lower()
    if not expected:
        raise ValueError(
            f"no SHA256 for {url}: pass expected_sha256 or use a URL with "
            "the hash as its second-to-last path segment")
    target = os.path.join(root, filename)
    if os.path.exists(target) and not os.path.isfile(target):
        raise RuntimeError(f"{target} exists and is not a regular file")
    if os.path.isfile(target):
        if _file_sha256(target) == expected:
            return target
        print(f"[fetch] {target} exists but SHA256 mismatches — "
              "re-downloading", file=sys.stderr)

    tmp = target + ".part"
    h = hashlib.sha256()
    done = 0
    with urllib.request.urlopen(url) as source, open(tmp, "wb") as out:
        total = source.info().get("Content-Length")
        total = int(total) if total else None
        while True:
            buf = source.read(8192)
            if not buf:
                break
            h.update(buf)
            out.write(buf)
            done += len(buf)
            if progress and total:
                print(f"\r[fetch] {filename}: {done}/{total} bytes",
                      end="", file=sys.stderr, flush=True)
    if progress:
        print(file=sys.stderr)
    got = h.hexdigest()
    if got != expected:
        os.unlink(tmp)
        raise RuntimeError(
            f"SHA256 mismatch for {url}: expected {expected}, got {got} — "
            "download discarded")
    os.replace(tmp, target)
    return target


def fetch_clip(model: str, root: str) -> str:
    if model not in CLIP_URLS:
        raise KeyError(
            f"unknown CLIP model {model!r}; known: {sorted(CLIP_URLS)}")
    return download(CLIP_URLS[model], root)


def stage_dataset(src: str, data_root: str, dataset: str,
                  manifest: dict = None, link: bool = False,
                  preflight: bool = False) -> dict:
    """Stage the three archive files for ``dataset`` from ``src`` into
    ``<data_root>/<dataset>/`` (the layout real_parity.py and the method
    configs expect), verifying each against ``manifest`` (filename →
    sha256) when given. ``link=True`` hardlinks/symlinks instead of
    copying (archives are multi-GB). ``preflight=True`` additionally opens
    each staged archive through our loaders (container-key resolution —
    the same check real_parity stage 1 performs)."""
    dest_dir = os.path.join(data_root, dataset)
    os.makedirs(dest_dir, exist_ok=True)
    report = {"dataset": dataset, "dest": dest_dir, "files": {}}
    for name in _ARCHIVE_FILES:
        src_path = os.path.join(src, name)
        if not os.path.isfile(src_path):
            raise FileNotFoundError(
                f"[stage:{dataset}] {src_path} missing — expected the "
                f"archive files {_ARCHIVE_FILES} in --src")
        entry = {"src": src_path}
        if manifest and name in manifest:
            got = _file_sha256(src_path)
            if got != manifest[name].lower():
                raise RuntimeError(
                    f"[stage:{dataset}] SHA256 mismatch for {src_path}: "
                    f"manifest says {manifest[name]}, file is {got}")
            entry["sha256"] = got
        dest = os.path.join(dest_dir, name)
        if os.path.abspath(src_path) != os.path.abspath(dest):
            if os.path.lexists(dest):
                os.unlink(dest)
            if link:
                try:
                    os.link(src_path, dest)
                except OSError:
                    os.symlink(os.path.abspath(src_path), dest)
            else:
                shutil.copy2(src_path, dest)
        entry["staged"] = dest
        report["files"][name] = entry
    if preflight:
        from cmh_tpu.data.builder import (
            load_captions, load_indexs, load_labels,
        )
        caps = load_captions(os.path.join(dest_dir, "caption.mat"))
        idx, npy = load_indexs(os.path.join(dest_dir, "index.mat"))
        labs = load_labels(os.path.join(dest_dir, "label.mat"))
        report["preflight"] = {
            "caption_rows": int(len(caps)),
            "index_rows": int(len(idx)),
            "label_shape": list(getattr(labs, "shape", ())),
            "npy": bool(npy),
        }
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    apc = sub.add_parser("clip", help="download a pretrained CLIP "
                         "checkpoint with SHA256 verification")
    apc.add_argument("--model", default="ViT-B/32",
                     choices=sorted(CLIP_URLS))
    apc.add_argument("--root", default=".")

    apd = sub.add_parser("dataset", help="stage local .mat archives into "
                         "the parity layout, verified")
    apd.add_argument("--src", required=True,
                     help="directory holding caption.mat/index.mat/label.mat")
    apd.add_argument("--data-root", required=True)
    apd.add_argument("--dataset", required=True,
                     help="coco / mirflickr / nuswide / ...")
    apd.add_argument("--manifest", default=None,
                     help="JSON file: {filename: sha256} to verify against")
    apd.add_argument("--link", action="store_true",
                     help="hardlink/symlink instead of copying")
    apd.add_argument("--preflight", action="store_true",
                     help="open each staged archive through our loaders")

    args = ap.parse_args(argv)
    if args.cmd == "clip":
        path = fetch_clip(args.model, args.root)
        print(json.dumps({"model": args.model, "path": path,
                          "sha256": _file_sha256(path)}))
    else:
        manifest = None
        if args.manifest:
            with open(args.manifest) as f:
                manifest = json.load(f)
        report = stage_dataset(args.src, args.data_root, args.dataset,
                               manifest=manifest, link=args.link,
                               preflight=args.preflight)
        print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
