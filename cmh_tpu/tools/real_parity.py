"""One-command parity table for REAL benchmark archives.

VERDICT r2 item 3a: when the coco / mirflickr / nuswide ``.mat`` archives
and the pretrained ``ViT-B-32.pt`` land (they are absent from this image),
this tool is the documented path from "assets arrived" to "parity table vs
BASELINE.md's published numbers":

    python -m cmh_tpu.tools.real_parity \
        --data-root ./data/transformer --dataset coco \
        --clip-path ./ViT-B-32.pt \
        --methods DCMHT --output-dims 16,32,64 \
        [--with-reference] [--preflight-only] \
        --save-dir result/parity

Stages:

1. **Preflight** — loads each archive file, reports the resolved container
   (key, shape, dtype, orientation), then materializes one item from each
   split through our loader (image tensor, token ids, padding mask, label).
   First contact with a real archive fails HERE with a named report, not
   three stages deep in a trainer. (Container variants are test-proven
   against synthesized replicas in tests/test_real_mat_layouts.py; this
   stage is the live check against the actual files.)
2. **Ours** — for each (method, dim): loads ``configs/<METHOD>/config.yaml``,
   overrides the dataset/clip/run fields from the CLI, trains with the
   reference protocol (train_num=10000, query_num=5000 by default —
   reference configs/base.yaml:41-42) and records best i->t / t->i mAP.
3. **Reference** (``--with-reference``) — the ACTUAL torch trainer from
   /root/reference on the same files and protocol, recording the same.
4. **Table** — markdown + JSON comparing ours vs reference (target |d| <=
   0.005, BASELINE.md north star) and vs the published TABLE I numbers
   (runners/TwDH/data/result.png) where a row exists.

Runs on whatever backend JAX selects; CMH_TPU_PLATFORM=cpu forces the host
(see main.py). The reference side is torch-CPU in this image.

Asset acquisition: ``python -m cmh_tpu.tools.fetch_assets`` downloads the
pretrained CLIP checkpoint with SHA256 verification and stages the ``.mat``
archives into the ``<data-root>/<dataset>/`` layout this tool expects —
see its docstring for the one-command sequence.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

# mAP@5000 I->T / T->I published in the reference repo
# (/root/reference/runners/TwDH/data/result.png TABLE I, transcribed in
# BASELINE.md "In-repo published numbers"). Keyed (method, dataset, bits).
PUBLISHED = {
    ("TwDH", "mirflickr", 16): (0.8783, 0.8566),
    ("TwDH", "mirflickr", 32): (0.8927, 0.8718),
    ("TwDH", "mirflickr", 64): (0.8993, 0.8759),
    ("TwDH", "nuswide", 16): (0.7842, 0.7748),
    ("TwDH", "nuswide", 32): (0.8144, 0.7965),
    ("TwDH", "nuswide", 64): (0.8191, 0.7955),
    ("TwDH", "coco", 16): (0.7348, 0.7348),
    ("TwDH", "coco", 32): (0.8051, 0.8027),
    ("TwDH", "coco", 64): (0.8422, 0.8514),
    ("DCMHT", "coco", 16): (0.6402, 0.6477),
    ("DCMHT", "coco", 32): (0.6952, 0.6964),
    ("DCMHT", "coco", 64): (0.7239, 0.7144),
}

# dataset-name aliases → the PUBLISHED table's canonical names
_DATASET_ALIASES = {
    "mirflickr25k": "mirflickr", "flickr25k": "mirflickr", "flickr": "mirflickr",
    "mscoco": "coco", "coco2014": "coco",
    "nus-wide": "nuswide", "nus_wide": "nuswide",
}


def _canonical(name: str) -> str:
    low = name.lower()
    return _DATASET_ALIASES.get(low, low)


def _describe(arr) -> str:
    if isinstance(arr, np.ndarray):
        return f"shape={arr.shape} dtype={arr.dtype}"
    return f"type={type(arr).__name__}"


def preflight(data_dir: str, files: dict, resolution: int, max_word: int,
              query_num: int, train_num: int) -> dict:
    """Validate the three archive files and one item per split; returns a
    report dict (raises with a named report section on first failure)."""
    from cmh_tpu.data.builder import (
        load_captions, load_indexs, load_labels, split_data,
    )
    from cmh_tpu.data.dataset import TransformerDataset
    from cmh_tpu.registry import registry

    report = {"data_dir": data_dir}
    paths = {k: os.path.join(data_dir, v) for k, v in files.items()}
    for kind, p in paths.items():
        assert os.path.isfile(p), (
            f"[preflight:{kind}] missing file {p} — expected the archive "
            f"layout <data-root>/<dataset>/{files[kind]}"
        )

    try:
        captions = load_captions(paths["caption"])
        report["caption"] = _describe(captions)
    except Exception as e:
        raise RuntimeError(
            f"[preflight:caption] {paths['caption']} not readable by "
            f"load_captions (keys tried: caption/tags/YAll): {e}"
        ) from e
    try:
        indexs, npy = load_indexs(paths["index"])
        report["index"] = _describe(indexs) + f" npy={npy}"
    except Exception as e:
        raise RuntimeError(
            f"[preflight:index] {paths['index']} not readable by "
            f"load_indexs (keys tried: index/imgs/FAll): {e}"
        ) from e
    try:
        labels = load_labels(paths["label"])
        report["label"] = _describe(labels)
    except Exception as e:
        raise RuntimeError(
            f"[preflight:label] {paths['label']} not readable by "
            f"load_labels (keys tried: category/LAll/labels): {e}"
        ) from e

    n = len(indexs)
    assert len(captions) == n and len(labels) == n, (
        f"[preflight:size] corpus sizes disagree: captions={len(captions)} "
        f"index={n} labels={len(labels)}"
    )
    assert n >= query_num + train_num, (
        f"[preflight:size] corpus has {n} items < query_num+train_num = "
        f"{query_num + train_num}"
    )
    report["corpus_items"] = int(n)

    # the reference protocol's split RNG (runners/base.py seeds np before
    # build) — here any fixed seed proves the plumbing
    np.random.seed(1814)
    split_indexs, split_captions, split_labels = split_data(
        captions, indexs, labels, query_num=query_num, train_num=train_num
    )
    tokenizer_cls = registry.get_tokenizer_class("clip_tokenizer")
    tokenizer = tokenizer_cls() if tokenizer_cls else None
    for name, (si, sc, sl) in zip(
        ("query", "train", "retrieval"),
        zip(split_indexs, split_captions, split_labels),
    ):
        ds = TransformerDataset(
            captions=sc, indexs=si, labels=sl, imageResolution=resolution,
            is_train=False, npy=npy, tokenizer=tokenizer, maxWords=max_word,
        )
        try:
            img, cap, mask, label, _ = ds[0]
        except Exception as e:
            raise RuntimeError(
                f"[preflight:{name}] split built but item 0 failed to "
                f"materialize (image decode / tokenize / label): {e}"
            ) from e
        assert img.shape[-3:] == (resolution, resolution, 3), (
            f"[preflight:{name}] image shape {img.shape}"
        )
        assert int(np.sum(np.asarray(cap) != 0)) >= 2, (
            f"[preflight:{name}] tokenized caption is empty: {cap[:8]}"
        )
        report[f"{name}_item0"] = (
            f"image{tuple(img.shape)} tokens{tuple(np.asarray(cap).shape)} "
            f"pad_mask_nonpad={int(np.sum(~np.asarray(mask, dtype=bool)))} "
            f"label{tuple(np.asarray(label).shape)}"
        )
    return report


def _method_cfg(method: str, args, dim: int, save_dir: str):
    from cmh_tpu.config import load_config

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cfg_path = args.config or os.path.join(repo, "configs", method,
                                           "config.yaml")
    assert os.path.isfile(cfg_path), f"no config for method {method}: {cfg_path}"
    cfg = load_config(cfg_path)
    cfg.model.update({"clip_path": args.clip_path})
    if args.clip_variant:
        cfg.model.update({"clip_variant": args.clip_variant})
    cfg.dataset.update({
        "path": args.data_root, "name": args.dataset,
        "txt_file": args.caption_file, "img_file": args.index_file,
        "label_file": args.label_file,
        "image_resolution": args.image_resolution,
        "max_word": args.max_word,
    })
    run_over = {
        "output_dim": dim, "save_dir": save_dir, "log_dir": save_dir,
        "train_num": args.train_num, "query_num": args.query_num,
        "seed": args.seed, "is_train": True,
    }
    if args.epochs is not None:
        run_over["epochs"] = args.epochs
    if args.batch_size is not None:
        run_over["batch_size"] = args.batch_size
    if args.scan_steps is not None:
        run_over["scan_steps"] = args.scan_steps
    cfg.run.update(run_over)
    return cfg


def run_ours(method: str, cfg) -> dict:
    from cmh_tpu.registry import registry

    runner_cls = registry.require_runner_class(cfg.run.get("arch"))
    t0 = time.perf_counter()
    trainer = runner_cls.from_config(cfg=cfg, world_size=1, auto_run=False)
    trainer.train()
    return {
        "map_i2t": float(trainer.max_mapi2t),
        "map_t2i": float(trainer.max_mapt2i),
        "best_epoch_i": int(trainer.best_epoch_i),
        "best_epoch_t": int(trainer.best_epoch_t),
        "wall_s": round(time.perf_counter() - t0, 1),
    }


def run_reference(method: str, cfg) -> dict:
    import torch

    from .ref_compat import load_reference

    ref_registry = load_reference()
    if not torch.cuda.is_available():
        cfg.run.update({"device": "cpu"})
    RefTrainer = ref_registry.get_runner_class(cfg.run.get("arch"))
    assert RefTrainer is not None, (
        f"reference has no runner {cfg.run.get('arch')}"
    )

    class RefDeferredRun(RefTrainer):
        def run(self):
            pass

    t0 = time.perf_counter()
    rt = RefDeferredRun.from_config(cfg=cfg, world_size=1, distributed=False)
    rt.train()
    return {
        "map_i2t": float(rt.max_mapi2t),
        "map_t2i": float(rt.max_mapt2i),
        "best_epoch_i": int(rt.best_epoch_i),
        "best_epoch_t": int(rt.best_epoch_t),
        "wall_s": round(time.perf_counter() - t0, 1),
    }


def emit_table(rows, dataset, out_path):
    lines = [
        f"# Real-data parity — {dataset}",
        "",
        "| method | bits | ours i->t | ours t->i | ref i->t | ref t->i | "
        "|d| max | published i->t | published t->i |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        ours, ref = r.get("ours"), r.get("reference")
        pub = PUBLISHED.get((r["method"], _canonical(dataset), r["bits"]))
        delta = ""
        if ours and ref:
            d = max(abs(ours["map_i2t"] - ref["map_i2t"]),
                    abs(ours["map_t2i"] - ref["map_t2i"]))
            delta = f"{d:.4f} {'OK' if d <= 0.005 else 'OVER'}"
        def fmt(side, key):
            return f"{side[key]:.4f}" if side else "—"

        pub_i2t = f"{pub[0]:.4f}" if pub else "—"
        pub_t2i = f"{pub[1]:.4f}" if pub else "—"
        lines.append(
            f"| {r['method']} | {r['bits']} | {fmt(ours, 'map_i2t')} | "
            f"{fmt(ours, 'map_t2i')} | {fmt(ref, 'map_i2t')} | "
            f"{fmt(ref, 'map_t2i')} | {delta or '—'} | {pub_i2t} | "
            f"{pub_t2i} |"
        )
    lines += ["", "Parity target: |ours - reference| <= 0.005 per direction "
              "(BASELINE.md north star). Published = reference repo TABLE I "
              "(mAP@5000; match the run protocol before comparing).", ""]
    with open(out_path, "w") as f:
        f.write("\n".join(lines))


def main():
    from ..utils.jax_setup import apply_platform_escape

    apply_platform_escape()
    from cmh_tpu.utils.jax_setup import enable_persistent_cache

    enable_persistent_cache()

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--data-root", required=True,
                    help="dir containing <dataset>/{caption,index,label}.mat")
    ap.add_argument("--dataset", required=True,
                    help="subdir name: coco | mirflickr | nuswide | ...")
    ap.add_argument("--clip-path", default="./ViT-B-32.pt")
    ap.add_argument("--caption-file", default="caption.mat")
    ap.add_argument("--index-file", default="index.mat")
    ap.add_argument("--label-file", default="label.mat")
    ap.add_argument("--methods", default="DCMHT",
                    help="comma list, e.g. DCMHT,MITH,TwDH")
    ap.add_argument("--output-dims", default="16,32,64")
    ap.add_argument("--config", default=None,
                    help="explicit config.yaml (else configs/<METHOD>/)")
    ap.add_argument("--train-num", type=int, default=10000)
    ap.add_argument("--query-num", type=int, default=5000)
    ap.add_argument("--epochs", type=int, default=None,
                    help="override the method config's epochs")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--scan-steps", type=int, default=None)
    ap.add_argument("--seed", type=int, default=1814)
    ap.add_argument("--image-resolution", type=int, default=224)
    ap.add_argument("--max-word", type=int, default=32)
    ap.add_argument("--clip-variant", default=None,
                    help="e.g. 'tiny' for smoke-testing the pipeline "
                         "without the full ViT-B/32")
    ap.add_argument("--with-reference", action="store_true",
                    help="also train the torch reference (CPU; slow at full "
                         "scale — hours per config)")
    ap.add_argument("--preflight-only", action="store_true")
    ap.add_argument("--save-dir", default="result/parity")
    args = ap.parse_args()

    data_dir = os.path.join(args.data_root, args.dataset)
    files = {"caption": args.caption_file, "index": args.index_file,
             "label": args.label_file}
    report = preflight(data_dir, files, resolution=args.image_resolution,
                       max_word=args.max_word, query_num=args.query_num,
                       train_num=args.train_num)
    print(json.dumps({"preflight": report}, indent=1))
    if args.preflight_only:
        return

    assert os.path.isfile(args.clip_path), (
        f"pretrained CLIP checkpoint not found: {args.clip_path}"
    )
    os.makedirs(args.save_dir, exist_ok=True)
    rows = []
    for method in args.methods.split(","):
        method = method.strip()
        for dim in (int(d) for d in args.output_dims.split(",")):
            tag = f"{method}-{args.dataset}-{dim}"
            cfg = _method_cfg(method, args, dim,
                              os.path.join(args.save_dir, tag, "ours"))
            os.makedirs(cfg.run.get("save_dir"), exist_ok=True)
            row = {"method": method, "bits": dim,
                   "ours": run_ours(method, cfg)}
            print(json.dumps({tag: row["ours"]}))
            if args.with_reference:
                ref_cfg = _method_cfg(
                    method, args, dim,
                    os.path.join(args.save_dir, tag, "reference"))
                os.makedirs(ref_cfg.run.get("save_dir"), exist_ok=True)
                row["reference"] = run_reference(method, ref_cfg)
                print(json.dumps({tag + "-reference": row["reference"]}))
            rows.append(row)

    out_json = os.path.join(args.save_dir, f"parity_{args.dataset}.json")
    with open(out_json, "w") as f:
        json.dump({"dataset": args.dataset, "preflight": report,
                   "rows": rows}, f, indent=1)
    emit_table(rows, args.dataset,
               os.path.join(args.save_dir, f"parity_{args.dataset}.md"))
    print(json.dumps({"parity_table": out_json}))


if __name__ == "__main__":
    main()
