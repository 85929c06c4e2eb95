"""Decompose eval code-generation cost (VERDICT r4 item 2).

BENCH_r04: eval_codegen_items_per_sec = 2076 vs encode_pairs_per_sec = 7029
— the product ``_encode_scan`` (runners/base.py: encode → make_hash_code →
masked scatter, chained in one dispatch) reads 3.4× below the raw encode
bench at the same batch. At protocol scale (5k query + 110k retrieval) that
is ~55s of codegen per eval against the 3.2s mAP kernel. This tool times,
on the same trainer and data:

  A. ``_encode_scan``           — the product path (what bench measures)
  B. encode-only scan           — same separate image/text applies, no
                                  make_hash_code / scatter
  C. bench-style combined apply — one ``module.apply`` on bf16 image
                                  stacks (what bench_encode measures)

A−B isolates the hash-code + scatter cost, B−C isolates separate-applies /
input-dtype / stacked-layout effects. Optionally captures an XLA trace of
A and prints the per-op breakdown (reuses profile_train._aggregate).

Run: python -m cmh_tpu.tools.profile_encode [--batch 256] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="DCMHT")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--nbatches", type=int, default=4)
    ap.add_argument("--output-dim", type=int, default=64)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--trace", action="store_true",
                    help="capture an XLA trace of the product path and "
                         "print the per-op breakdown")
    args = ap.parse_args(argv)

    import jax

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

    tmp = tempfile.mkdtemp(prefix="cmh_prof_enc_")
    model_cfg = {"arch": args.method, "clip_path": "/nonexistent.pt"}
    if args.tiny:
        model_cfg["clip_variant"] = "tiny"
    cfg = config_from_dict({
        "model": model_cfg,
        "optimizer": {"arch": "BertAdam", "lr": 0.001, "clip_lr": 0.00001},
        "dataset": {"arch": "synthetic_dataset", "name": "synthetic",
                    "num_classes": 8,
                    "image_resolution": 32 if args.tiny else 224,
                    "max_word": 12 if args.tiny else 32},
        "run": {"arch": f"{args.method}Trainer", "save_dir": tmp,
                "log_dir": tmp, "output_dim": args.output_dim,
                "batch_size": args.batch, "is_train": True,
                "train_num": args.batch * 3,
                "query_num": args.batch * args.nbatches,
                "epochs": 1, "display_step": 10 ** 9, "seed": 1},
    })
    tr = registry.require_runner_class(f"{args.method}Trainer").from_config(
        cfg=cfg, auto_run=False)
    print(f"device: {jax.devices()[0]}, batch {args.batch} × "
          f"{args.nbatches} batches", flush=True)

    q_stacked = {
        k: jnp.stack([jnp.asarray(b[k]) for b in blist])
        for blist in [list(iter(tr.query_loader))] for k in blist[0]
    }
    n_items = args.batch * args.nbatches

    def fresh_buffers():
        k = tr.method.eval_code_dims()
        return (jnp.zeros((tr.query_num, k), jnp.float32),
                jnp.zeros((tr.query_num, k), jnp.float32))

    def timed(fn, runs=args.runs):
        out = fn()
        jax.tree_util.tree_map(
            lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            out = fn()
            jax.tree_util.tree_map(
                lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
            times.append(time.perf_counter() - t0)
        return sorted(times)[len(times) // 2]

    # --- A: the product path -------------------------------------------
    t_a = timed(lambda: tr._encode_scan(
        tr.state.params, tr.state.model_state, fresh_buffers(), q_stacked))
    print(f"A product _encode_scan:      {t_a*1e3:7.1f} ms "
          f"({n_items / t_a:7.0f} items/s)", flush=True)

    # --- B: encode-only scan (no make_hash_code / scatter) --------------
    @jax.jit
    def encode_only(params, model_state, stacked):
        def body(acc, b):
            img, txt = tr._encode_step(params, model_state, b)
            return acc + jnp.sum(img, dtype=jnp.float32) + jnp.sum(
                txt, dtype=jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), stacked)
        return acc

    t_b = timed(lambda: encode_only(
        tr.state.params, tr.state.model_state, q_stacked))
    print(f"B encode-only scan:          {t_b*1e3:7.1f} ms "
          f"({n_items / t_b:7.0f} items/s)", flush=True)

    # --- C: bench-style combined apply on bf16 stacks --------------------
    method = tr.method
    istack = q_stacked["image"].astype(jnp.bfloat16)
    tstack = q_stacked["text"]
    kstack = q_stacked["key_padding_mask"]
    variables = {"params": tr.state.params, **tr.state.model_state}

    @jax.jit
    def combined(v, ist, tst, kst):
        def body(acc, itk):
            i, t, k = itk
            img_h, txt_h = method.module.apply(
                v, i.astype(jnp.float32), t, k, train=False)
            return acc + jnp.sum(img_h, dtype=jnp.float32) + jnp.sum(
                txt_h, dtype=jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), (ist, tst, kst))
        return acc

    t_c = timed(lambda: combined(variables, istack, tstack, kstack))
    print(f"C combined apply (bf16 in):  {t_c*1e3:7.1f} ms "
          f"({n_items / t_c:7.0f} items/s)", flush=True)

    print(json.dumps({
        "batch": args.batch, "nbatches": args.nbatches,
        "product_ms": round(t_a * 1e3, 1),
        "encode_only_ms": round(t_b * 1e3, 1),
        "combined_bf16_ms": round(t_c * 1e3, 1),
        "product_items_per_sec": round(n_items / t_a, 1),
        "encode_only_items_per_sec": round(n_items / t_b, 1),
        "combined_items_per_sec": round(n_items / t_c, 1),
        "hash_scatter_overhead_ms": round((t_a - t_b) * 1e3, 1),
        "apply_structure_overhead_ms": round((t_b - t_c) * 1e3, 1),
    }), flush=True)

    if args.trace:
        from .profile_train import _aggregate

        outdir = tempfile.mkdtemp(prefix="cmh_xplane_enc_")
        with jax.profiler.trace(outdir):
            out = tr._encode_scan(tr.state.params, tr.state.model_state,
                                  fresh_buffers(), q_stacked)
            jax.tree_util.tree_map(
                lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
        _aggregate(outdir, args.nbatches)


if __name__ == "__main__":
    sys.exit(main())
