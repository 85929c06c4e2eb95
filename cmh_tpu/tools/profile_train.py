"""Profile the real jitted train step and aggregate device op time.

Usage:
    python -m cmh_tpu.tools.profile_train [--method DCMHT] [--batch 256]
        [--steps 6] [--outdir /tmp/cmh_prof]

Runs the trainer's actual ``_train_scan`` (forward + loss + backward +
BertAdam, one dispatch for all steps — CLAUDE.md "Benchmarking traps" #3),
captures an XLA profiler trace, and prints a per-step device-time breakdown
grouped by (hlo category, op kind, output shape). This is the tool that
located the round-2 hot spots (per-leaf optimizer op soup, attention
head-split layout copies); reference counterpart: none (the reference has
no profiling — SURVEY.md §5).

The xplane parsing needs tensorflow's profiler protos (present in this
image); degrades to a plain timing report when unavailable.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile
import time


def _aggregate(outdir: str, steps: int):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception:
        print("(tensorflow profiler protos unavailable — skipping op "
              "breakdown)")
        return
    paths = sorted(glob.glob(os.path.join(
        outdir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        print("(no xplane captured)")
        return
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    matched = False
    for plane in xs.planes:
        # TPU op timelines live on "/device:TPU:N"; the CPU backend does
        # not emit per-op XLA timelines, so this section is TPU-only
        if not plane.name.startswith("/device:"):
            continue
        matched = True
        md = plane.event_metadata
        smd = plane.stat_metadata
        rows = collections.Counter()
        total = 0.0
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                m = md[ev.metadata_id]
                cat = ""
                for st in m.stats:
                    if smd[st.metadata_id].name == "hlo_category":
                        cat = st.str_value
                base = re.sub(r"[.\d]+$", "", m.name.split(" = ")[0])
                shape = ""
                mm = re.search(r"= (\S+?[\]}])", m.name)
                if mm:
                    shape = mm.group(1)[:44]
                dur = ev.duration_ps / 1e12
                rows[(cat, base, shape)] += dur
                if cat != "while":          # while double-counts its body
                    total += dur
        print(f"\n=== {plane.name}: {total / steps * 1e3:.1f} ms/step device "
              f"time ===")
        for (cat, base, shape), v in rows.most_common(40):
            if cat == "while":
                continue
            print(f"{v / steps * 1e3:8.3f} ms/step  {cat:22s} {base:30s} "
                  f"{shape}")
    if not matched:
        print("(no device op timeline in the trace — per-op breakdown is "
              "TPU-only)")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="DCMHT")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--output-dim", type=int, default=64)
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny CLIP (CPU-friendly shapes)")
    args = ap.parse_args(argv)

    import jax

    # CMH_TPU_PLATFORM=cpu must beat the axon sitecustomize, which pins
    # JAX_PLATFORMS=axon in every process (CLAUDE.md environment quirks)
    from ..utils.jax_setup import apply_platform_escape

    apply_platform_escape()
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import cmh_tpu  # noqa: F401
    from cmh_tpu.config import config_from_dict
    from cmh_tpu.registry import registry

    tmp = tempfile.mkdtemp(prefix="cmh_prof_")
    model_cfg = {"arch": args.method, "clip_path": "/nonexistent.pt"}
    if args.tiny:
        model_cfg["clip_variant"] = "tiny"
    cfg = config_from_dict({
        "model": model_cfg,
        "optimizer": {"arch": "BertAdam", "lr": 0.001, "clip_lr": 0.00001},
        "dataset": {"arch": "synthetic_dataset", "name": "synthetic",
                    "num_classes": 8,
                    "image_resolution": 32 if args.tiny else 224,
                    # tiny CLIP's text context is shorter than the full 77
                    "max_word": 12 if args.tiny else 32},
        "run": {"arch": f"{args.method}Trainer", "save_dir": tmp,
                "log_dir": tmp, "output_dim": args.output_dim,
                "batch_size": args.batch, "is_train": True,
                "train_num": args.batch * 3, "query_num": args.batch * 4,
                "epochs": 1, "display_step": 10 ** 9, "seed": 1},
    })
    tr = registry.require_runner_class(f"{args.method}Trainer").from_config(
        cfg=cfg, auto_run=False)
    batches = [
        {k: jnp.asarray(v) for k, v in b.items()} for b in iter(tr.train_loader)
    ]
    stacked = {
        k: jnp.stack([batches[i % len(batches)][k] for i in range(args.steps)])
        for k in batches[0]
    }
    tr.state, (losses, _) = tr._train_scan(tr.state, stacked)   # compile + warm
    float(losses[-1])
    t0 = time.perf_counter()
    tr.state, (losses, _) = tr._train_scan(tr.state, stacked)
    float(jnp.sum(losses))
    dt = (time.perf_counter() - t0) / args.steps
    print(f"train step: {dt * 1e3:.2f} ms  ({args.batch / dt:.0f} pairs/s)")

    outdir = args.outdir or tempfile.mkdtemp(prefix="cmh_xplane_")
    with jax.profiler.trace(outdir):
        tr.state, (losses, _) = tr._train_scan(tr.state, stacked)
        float(jnp.sum(losses))
    _aggregate(outdir, args.steps)


if __name__ == "__main__":
    sys.exit(main())
