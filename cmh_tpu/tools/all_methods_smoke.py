"""One-method on-device smoke: a real train step + 4-direction eval.

Evidence tool for the recovery battery: every registered method must
build, compile, step, and eval on the ACTUAL backend (the real TPU when
the tunnel is up — round 1 only ever ran DCMHT there). Tiny CLIP variant
and synthetic data keep the remote compiles small; one method per process
so a wedged tunnel can be killed per stage.

    python -m cmh_tpu.tools.all_methods_smoke --method MITH
    → {"method": "MITH", "ok": true, "backend": "tpu", "loss": ...,
       "maps": [...], "build_s": ..., "step1_s": ..., "eval_s": ...}

Recipes mirror the per-method test smokes (tests/test_mith.py,
test_dsph_dnph.py, test_dimch.py, test_umoed.py, test_twdh.py).
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time

RECIPES = {
    "DCMHT": dict(runner="DCMHTTrainer", model={"hash_func": "softmax"}),
    "MITH": dict(runner="MITHTrainer",
                 model={"hash_func": "tanh", "top_k_label": 3,
                        "transformer_layers": 1, "res_mlp_layers": 1},
                 batch=8),
    "DSPH": dict(runner="DSPHTrainer",
                 model={"hash_func": "tanh", "numclass": 4, "alpha": 0.8},
                 optimizer={"hyp": {"lr": 0.02}}),
    "DNPH": dict(runner="DNPHTrainer",
                 model={"hash_func": "tanh", "numclass": 4, "mrg": 1.0,
                        "noise_alpha": 0.1},
                 optimizer={"loss": {"lr": 0.0001}}),
    "TwDH": dict(runner="TwDHTrainer",
                 model={"hash_func": "softmax", "long_dim": 32,
                        "short_dims": [8], "numclass": 4,
                        "quan_alpha": 0.5, "low_rate": 0.1,
                        "long_center": "/nonexistent_centers",
                        "short_center": "/nonexistent_centers",
                        "trans_matrix": "/nonexistent_centers"},
                 batch=8),
    "DIMCH": dict(runner="DIMCHTrainer",
                  model={"hash_func": "tanh", "setDim": 4, "dropout": 0.1,
                         "distance": {"mode": "smooth_chamfer"},
                         "chamfer": {"mmd_alpha": 1.0, "unif_alpha": 0.3,
                                     "token_triplet_margin": 0.3},
                         "hash_pars": {"triplet_alpha": 50, "quan_alpha": 1.0,
                                       "hash_triplet_alpha": 50,
                                       "triplet_margin": 0.3}},
                  batch=8),
    "UMoED": dict(runner="UMoEDTrainer",
                  model={"hash_func": "linear_subspace",
                         "merge_func": "concatenate", "setDim": 8,
                         "MoE": True, "fusion": True, "num_experts": 2,
                         "slots_per_expert": 2, "decoder_heads": 2,
                         "decoder_layers": 1, "hidden_dim": 32,
                         "dropout": 0.1, "extreme": True, "extreme_T": 0.3,
                         "triplet": True, "distance_mode": "cosine",
                         "distance": {"mode": "pairwise"},
                         "chamfer": {"unif_alpha": 0.8,
                                     "token_triplet_margin": 0.1},
                         "hash_pars": {"triplet_alpha": 1,
                                       "triplet_margin": 0.3}},
                  batch=8, output_dim=8),
    "Baseline": dict(runner="BaselineTrainer",
                     model={"hash_func": "tanh", "quan_alpha": 0.001,
                            "dropout": 0.1}),
}


def run_method(method: str) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import cmh_tpu  # noqa: F401
    from ..config import config_from_dict
    from ..registry import registry
    from ..utils.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    r = RECIPES[method]
    batch = r.get("batch", 16)
    output_dim = r.get("output_dim", 8)
    tmp = tempfile.mkdtemp(prefix=f"smoke_{method}_")
    cfg = config_from_dict({
        "model": dict({"arch": method, "clip_path": "/nonexistent.pt",
                       "clip_variant": "tiny"}, **r["model"]),
        "optimizer": dict({"arch": "BertAdam", "lr": 0.002,
                           "clip_lr": 0.0005}, **r.get("optimizer", {})),
        "dataset": {"arch": "synthetic_dataset", "name": "synthetic",
                    "num_classes": 4, "image_resolution": 32,
                    "max_word": 12},
        "run": {"arch": r["runner"], "save_dir": tmp, "log_dir": tmp,
                "output_dim": output_dim, "batch_size": batch,
                "is_train": True, "train_num": 2 * batch,
                "query_num": batch, "epochs": 1, "display_step": 1000,
                "seed": 5},
    })
    t0 = time.perf_counter()
    tr = registry.require_runner_class(r["runner"]).from_config(
        cfg=cfg, auto_run=False)
    build_s = time.perf_counter() - t0

    b = next(iter(tr.train_loader))
    db = {k: jnp.asarray(v) for k, v in b.items()}
    t0 = time.perf_counter()
    tr.state, loss, _ = tr._train_step(tr.state, db)
    loss = float(loss)  # host fetch = real sync through the tunnel
    step1_s = time.perf_counter() - t0
    assert np.isfinite(loss), f"{method}: loss not finite"

    t0 = time.perf_counter()
    maps = tr.valid(epoch=0)
    eval_s = time.perf_counter() - t0
    assert all(0.0 <= float(m) <= 1.0 for m in maps)

    return {"method": method, "ok": True,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "loss": round(loss, 6),
            "maps": [round(float(m), 6) for m in maps],
            "build_s": round(build_s, 2), "step1_s": round(step1_s, 2),
            "eval_s": round(eval_s, 2)}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--method", required=True, choices=sorted(RECIPES))
    args = ap.parse_args(argv)
    import os

    from ..utils.jax_setup import apply_platform_escape

    apply_platform_escape()
    try:
        out = run_method(args.method)
    except Exception as e:  # one line either way — the battery parses it
        out = {"method": args.method, "ok": False,
               "error": f"{type(e).__name__}: {e}"[:500]}
    print("@SMOKE@" + json.dumps(out))


if __name__ == "__main__":
    main()
