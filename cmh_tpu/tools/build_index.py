"""Build a serving index (and optional encoder export) from a trained run.

Closes the train → deploy loop the reference never had (it stops at `.mat`
dumps, /root/reference/runners/base.py:386-405): encode the dataset's
retrieval split through the trained model with the trainer's exact eval
path (same transforms, same binarization, same scan-chunked device
dispatch), pack the codes into a ``RetrievalIndex``, and optionally emit
the StableHLO encoder artifact in the same pass — everything
``cmh_tpu.server`` needs to answer queries.

    python -m cmh_tpu.tools.build_index --config-file configs/DCMHT/config.yaml \
        --model result/.../model-9.msgpack --out-index gallery \
        [--modality image|text] [--out-encoders enc.cmh]
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--model", required=True,
                    help="weights msgpack from a training run (model-N.msgpack)")
    ap.add_argument("--out-index", required=True,
                    help="output .npz path prefix for the RetrievalIndex")
    ap.add_argument("--modality", choices=("image", "text"), default="image",
                    help="which tower's codes populate the gallery")
    ap.add_argument("--out-encoders", default=None,
                    help="also export the StableHLO encoders to this path")
    args = ap.parse_args(argv)

    import jax

    from ..utils.jax_setup import apply_platform_escape

    apply_platform_escape()

    import numpy as np

    import cmh_tpu  # noqa: F401  (registers everything)
    from ..config import load_config
    from ..registry import registry
    from ..serving import RetrievalIndex

    cfg = load_config(args.config_file)
    # eval-only trainer: builds the dataset, model, and the jitted encode
    # path; the weights load through the reference-parity resume seam
    cfg.run.update({"is_train": False, "resume_model": args.model,
                    "save_dir": os.path.dirname(
                        os.path.abspath(args.out_index)) or "."})
    runner_cls = registry.require_runner_class(
        cfg.run.get("arch", "DCMHTTrainer"))
    tr = runner_cls.from_config(cfg=cfg, auto_run=False)

    codes = tr.get_code(tr.retrieval_loader, tr.retrieval_num)
    # TwDH returns (long_i, long_t, shorts_i, shorts_t); plain methods
    # (img, txt) — index the requested modality's top-level code matrix
    pick = 0 if args.modality == "image" else 1
    gallery = np.asarray(codes[pick], np.float32)
    index = RetrievalIndex(bits=gallery.shape[1])
    index.add(gallery)
    index.save(args.out_index)
    out_path = args.out_index if args.out_index.endswith(".npz") \
        else args.out_index + ".npz"

    enc_path = None
    if args.out_encoders:
        from ..export import export_encoders

        enc_path = args.out_encoders
        export_encoders(
            tr.method,
            {"params": tr.state.params, **tr.state.model_state},
            enc_path, max_words=cfg.dataset.get("max_word", 32),
            method_state=tr.method.eval_method_state() or None,
        )

    print(json.dumps({
        "index": out_path, "items": len(index), "bits": index.bits,
        "modality": args.modality, "encoders": enc_path,
    }))


if __name__ == "__main__":
    main()
