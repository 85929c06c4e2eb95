"""Benchmark: runs on one real TPU chip, prints ONE JSON line.

Primary metric: packed-code Hamming throughput (query×gallery comparisons/sec
per chip) at coco eval scale (5000 queries × 110k gallery, 64-bit codes) —
the driver's north-star target is ≥100M cmp/s/chip (BASELINE.md), so
``vs_baseline`` = value / 1e8. Extra fields report the encode throughput
(image+text pairs/sec/chip on the ViT-B/32 DCMHT forward) and the full
4-direction mAP@all eval wall time at 64 bits.

Remote TPU compiles through the axon tunnel can take many minutes on a cold
cache; the mAP section therefore runs in a subprocess with a hard timeout so
the primary JSON line is always produced, and all compiles go through a
repo-local persistent compilation cache.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")


def _configure_jax():
    import jax

    os.makedirs(CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _sync(x):
    import jax

    jax.block_until_ready(x)
    return x


def bench_hamming(num_q=5000, num_r=110_000, bits=64, iters=16, runs=3):
    """Packed-code Hamming throughput via the VPU XOR+popcount Pallas kernel.

    Timing discipline for the tunneled TPU backend (cost a round to learn,
    see CLAUDE.md "Benchmarking traps"): the iteration loop lives ON DEVICE —
    one ``lax.scan`` over a stacked (iters, Q, W) query tensor inside a
    single jitted program, so a run is ONE dispatch and ONE host fetch.
    A python-side loop of jitted calls would pay the ~40ms relay dispatch
    per iteration and measure the tunnel, not the kernel (this is exactly
    how round 1's driver bench ended up 10× under the dev number). Inputs
    differ per iteration (identical inputs can hit backend caches) and the
    scan carries a data dependency so iterations can't be elided. Reports
    the median of ``runs`` runs.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cmh_tpu.ops.hamming_pallas import hamming_packed
    from cmh_tpu.ops.hashing import pack_bits

    rng = np.random.RandomState(0)
    r = jnp.asarray(rng.choice([-1.0, 1.0], size=(num_r, bits)).astype(np.float32))
    rp = _sync(pack_bits(r))

    def stacked_queries(seed):
        rs = np.random.RandomState(seed)
        qs = rs.choice([-1.0, 1.0], size=(iters, num_q, bits)).astype(np.float32)
        return _sync(jax.vmap(pack_bits)(jnp.asarray(qs)))

    @jax.jit
    def ham_scan(qstack, rp):
        def body(carry, qp):
            # carry-dependent perturbation: no iteration can be hoisted/CSEd
            q = jnp.bitwise_xor(qp, carry.astype(jnp.uint32) & jnp.uint32(1))
            s = jnp.sum(hamming_packed(q, rp), dtype=jnp.float32)
            return carry + s, s

        total, _ = jax.lax.scan(body, jnp.float32(0.0), qstack)
        return total

    stacks = [stacked_queries(s) for s in range(runs)]
    float(ham_scan(stacks[0], rp))  # compile + warm
    rates = []
    for qstack in stacks:
        t0 = time.perf_counter()
        float(ham_scan(qstack, rp))  # one dispatch, one fetch
        dt = (time.perf_counter() - t0) / iters
        rates.append(num_q * num_r / dt)
    return float(np.median(rates))


def bench_encode_best(batches=(64, 256), iters=10):
    """Best pairs/s over batch sizes (MXU utilization grows with batch)."""
    return max(bench_encode(b, iters) for b in batches)


def bench_encode(batch=64, iters=8, runs=3):
    import jax
    import jax.numpy as jnp

    import cmh_tpu  # noqa: F401
    from cmh_tpu.config import config_from_dict
    from cmh_tpu.models.dcmht import DCMHTMethod

    import numpy as np

    cfg_model = config_from_dict({"model": {}}).model
    method = DCMHTMethod.from_config(cfg_model, output_dim=64)
    res = method.clip_cfg.image_resolution
    image = jnp.zeros((batch, res, res, 3), jnp.float32)
    text = jnp.zeros((batch, 32), jnp.int32)
    kpm = jnp.zeros((batch, 32), bool)
    variables = method.init_variables(
        jax.random.PRNGKey(0), {"image": image, "text": text, "key_padding_mask": kpm}
    )

    # iteration loop ON DEVICE (see bench_hamming): a python loop of jitted
    # calls pays the ~40ms relay dispatch per call — at batch 256 that alone
    # caps the reading at ~6.4e3 pairs/s regardless of the model (this is
    # what round 1 reported). One lax.scan over a stacked input = one
    # dispatch, one fetch. The carry perturbs each iteration's input so no
    # iteration can be hoisted or CSEd. Images ride bf16 on the wire (the
    # model computes in bf16 anyway) so the stack fits comfortably in HBM.
    @jax.jit
    def fwd_scan(v, istack, tstack, k):
        def body(carry, it):
            i, t = it
            i = i.astype(jnp.float32) + carry * 1e-6
            img_hash, txt_hash = method.module.apply(v, i, t, k, train=False)
            s = jnp.sum(img_hash, dtype=jnp.float32) + jnp.sum(
                txt_hash, dtype=jnp.float32
            )
            return carry + s, s

        total, _ = jax.lax.scan(body, jnp.float32(0.0), (istack, tstack))
        return total

    rng = np.random.RandomState(0)
    istack = _sync(jnp.asarray(
        rng.randn(iters, batch, res, res, 3).astype(np.float32),
        dtype=jnp.bfloat16,
    ))
    tstack = _sync(jnp.asarray(
        rng.randint(1, 49405, size=(iters, batch, 32)).astype(np.int32)
    ))
    float(fwd_scan(variables, istack, tstack, kpm))  # compile + warm
    rates = []
    for _ in range(runs):
        t0 = time.perf_counter()
        float(fwd_scan(variables, istack, tstack, kpm))
        dt = (time.perf_counter() - t0) / iters
        rates.append(batch / dt)
    return float(np.median(rates))


MAP_CHILD = r"""
import json, os, time, sys
import jax
jax.config.update("jax_compilation_cache_dir", sys.argv[1])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from cmh_tpu.ops.map_bucketed import calc_map_k_4dir_auto as calc_map_k_4dir
rng = np.random.RandomState(1)
nq, nr, classes = 5000, 110_000, 80
ql = (rng.rand(nq,classes)>0.9).astype(np.float32); ql[:,0]=1
rl = (rng.rand(nr,classes)>0.9).astype(np.float32); rl[:nr//10,0]=1
out = {}
# BASELINE.md primary metrics name BOTH 16- and 64-bit coco-scale eval time
for bits, key in ((64, "map_time"), (16, "map_time_16bit")):
    qi = rng.choice([-1.,1.], size=(nq,bits)).astype(np.float32)
    qt = rng.choice([-1.,1.], size=(nq,bits)).astype(np.float32)
    ri = rng.choice([-1.,1.], size=(nr,bits)).astype(np.float32)
    rt = rng.choice([-1.,1.], size=(nr,bits)).astype(np.float32)
    calc_map_k_4dir(qi[:1024], qt[:1024], ri, rt, ql[:1024], rl)  # compile
    # median of 3: the trainer runs this every epoch, so steady-state is
    # the honest per-epoch cost (first call pays cache-load/tuning)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        calc_map_k_4dir(qi, qt, ri, rt, ql, rl)  # trainer's full valid()
        times.append(time.perf_counter() - t0)
    out[key] = sorted(times)[1]
print(json.dumps(out))
"""


TRAIN_CHILD = r"""
import json, sys, time, os
# measured path: the fused-attention backward is perf-neutral end-to-end on
# this backend (CLAUDE.md chip notes) and its compiled form on the real chip
# is less battle-tested than the einsum path — hard-pin the known-good
# lowering (an exported CMH_TPU_FUSED=1 from kernel experiments must not
# leak into the driver's metric)
os.environ["CMH_TPU_FUSED"] = "0"
import jax
jax.config.update("jax_compilation_cache_dir", sys.argv[1])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, tempfile
from cmh_tpu.config import config_from_dict
from cmh_tpu.registry import registry
import cmh_tpu
tmp = tempfile.mkdtemp()
batch = 256  # ~1.9e3 pairs/s, chip-bound: 128.1 ms/step DEVICE time at this
# batch (tools/artifacts/battery/train_profile_b256_r05.log), of which
# ~18 ms is flat-BertAdam HBM traffic over the 151M-param fp32 state —
# batch-independent, which is why larger batches still beat batch 100
cfg = config_from_dict({
  "model": {"arch": "DCMHT", "clip_path": "/nonexistent.pt", "hash_func": "softmax"},
  "optimizer": {"arch": "BertAdam", "lr": 0.001, "clip_lr": 0.00001},
  "dataset": {"arch": "synthetic_dataset", "name": "synthetic", "num_classes": 8,
              "image_resolution": 224, "max_word": 32},
  "run": {"arch": "DCMHTTrainer", "save_dir": tmp, "log_dir": tmp,
          "output_dim": 64, "batch_size": batch, "is_train": True,
          "train_num": batch * 3, "query_num": batch * 4, "epochs": 1,
          "display_step": 100000, "seed": 1},
})
tr = registry.get_runner_class("DCMHTTrainer").from_config(cfg=cfg, auto_run=False)
import jax.numpy as jnp
batches = []
for b in iter(tr.train_loader):
    batches.append({k: jnp.asarray(v) for k, v in b.items()})
# steps chained ON DEVICE via the trainer's lax.scan path: a python loop of
# jitted _train_step calls pays a ~40ms relay dispatch per step through the
# tunnel (CLAUDE.md trap #3) — at ~100ms/step that overhead alone is ~40% of
# the reading. One dispatch + one fetch measures the chip, which is what a
# real (non-tunneled) deployment sees.
n = 6
stacked = {k: jnp.stack([batches[i % len(batches)][k] for i in range(n)])
           for k in batches[0]}
tr.state, (losses, _) = tr._train_scan(tr.state, stacked)   # compile
float(losses[-1])
t0 = time.perf_counter()
tr.state, (losses, _) = tr._train_scan(tr.state, stacked)
# host fetch of a value depending on every step forces completion
float(jnp.sum(losses))
dt = (time.perf_counter() - t0) / n
# eval code generation: all 4 query batches chained in ONE device dispatch
# via the trainer's scan-chunked encode program (cfg.run.scan_steps in the
# product loop) — a python loop of per-batch generate_hash calls pays the
# ~40ms relay dispatch each (trap #3). Batches are pre-uploaded: the
# synthetic dataset renders images procedurally on the 1-core host and the
# relay upload (154MB/batch) would otherwise dominate; the real pipelined
# eval loop overlaps both with compute.
q_stacked = {
    k: jnp.stack([jnp.asarray(b[k]) for b in blist])
    for blist in [list(iter(tr.query_loader))] for k in blist[0]
}
def fresh_buffers():
    k = tr.method.eval_code_dims()
    return (jnp.zeros((tr.query_num, k), jnp.float32),
            jnp.zeros((tr.query_num, k), jnp.float32))
qi, qt = tr._encode_scan(tr.state.params, tr.state.model_state,
                         fresh_buffers(), q_stacked)         # compile
float(jnp.sum(qi))
# median of 3: a single post-train-scan measurement reads ~2.5x slow
# (straggling device/relay state from the donated train step — BENCH_r04's
# 2076 items/s vs 5298 through the same program measured clean,
# tools/artifacts/battery/profile_encode_r05.json)
code_times = []
for _ in range(3):
    t1 = time.perf_counter()
    qi, qt = tr._encode_scan(tr.state.params, tr.state.model_state,
                             fresh_buffers(), q_stacked)
    float(jnp.sum(qi) + jnp.sum(qt))
    code_times.append(time.perf_counter() - t1)
code_dt = sorted(code_times)[1]
print(json.dumps({"train_pairs_per_sec": batch / dt,
                  "eval_codegen_items_per_sec": tr.query_num / code_dt,
                  "eval_codegen_times_s": [round(t, 4) for t in code_times]}))
"""


def bench_train_subprocess(timeout_s=1800):
    """Full DCMHT train-step (ViT-B/32 fwd+bwd+BertAdam) pairs/sec/chip,
    plus the eval code-generation rate; returns (train_rate, codegen_rate)."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c", TRAIN_CHILD, CACHE_DIR],
            capture_output=True, timeout=timeout_s, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in proc.stdout.strip().splitlines()[::-1]:
            if line.startswith("{"):
                d = json.loads(line)
                return (d["train_pairs_per_sec"],
                        d.get("eval_codegen_items_per_sec"))
    except Exception:
        pass
    return None, None


def bench_map_eval_subprocess(timeout_s=1500):
    """4-direction mAP@all at coco scale in a child (compile may be slow).

    Returns (map_time_64bit, map_time_16bit) — both BASELINE.md primary
    metrics; either may be None on timeout."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c", MAP_CHILD, CACHE_DIR],
            capture_output=True, timeout=timeout_s, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in proc.stdout.strip().splitlines()[::-1]:
            if line.startswith("{"):
                d = json.loads(line)
                return d.get("map_time"), d.get("map_time_16bit")
    except Exception:
        pass
    return None, None


def bench_serving_device(n=10_000_000, q=64, bits=64, topk=100, runs=5):
    """Device-side blocked serving search (serving._search_blocked): exact
    top-k over a 10M-item packed gallery (80 MB in HBM at 64 bits) without
    ever materializing the (Q, N) distance matrix. One jitted program =
    one dispatch + one fetch per run (CLAUDE.md trap #3); queries vary per
    run (trap #2).

    Returns a dict with the median rate plus forensics (select path, raw
    per-run times, best rate): BENCH_r04 recorded 2.66e8 cmp/s where the
    same-code battery capture recorded 2.42e9 — an unexplained 9× spread
    on a shared tunnel must never again be a bare number with no
    provenance. Per-run times also go to stderr so a timed-out stage still
    leaves evidence in the driver tail."""
    import jax.numpy as jnp
    import numpy as np

    from cmh_tpu import serving
    from cmh_tpu.serving import _DEVICE_BLOCK, _search_blocked

    rng = np.random.RandomState(0)
    words = bits // 32
    gallery = _sync(jnp.asarray(
        rng.randint(0, 2**32, size=(n, words), dtype=np.uint32)))

    def qs(seed):
        r = np.random.RandomState(seed)
        return _sync(jnp.asarray(
            r.randint(0, 2**32, size=(q, words), dtype=np.uint32)))

    queries = [qs(s) for s in range(runs + 1)]
    for _ in range(2):  # compile, then one warm pass (deferred transfers)
        d, i = _search_blocked(queries[-1], gallery, topk, _DEVICE_BLOCK)
        float(d.sum() + i.sum())
    times = []
    for k, qp in enumerate(queries[:runs]):
        t0 = time.perf_counter()
        d, i = _search_blocked(qp, gallery, topk, _DEVICE_BLOCK)
        float(d.sum() + i.sum())  # data-dependent host fetch = sync
        times.append(time.perf_counter() - t0)
        print(f"[bench] serving run {k}: {times[-1]:.4f}s", file=sys.stderr,
              flush=True)
    med = sorted(times)[len(times) // 2]
    return {
        "cmp_per_sec": q * n / med,
        "best_cmp_per_sec": q * n / min(times),
        "times_s": [round(t, 4) for t in times],
        "select": serving._SELECT,
        "collect": serving._COLLECT,
        "dcache_mb": serving._DCACHE_MB,
    }


def bench_serving_cpu(n=500_000, q=64, bits=64, topk=100, runs=3):
    """Host-side serving scorer (native/hash_ops.cpp): exact top-k over a
    packed gallery on the CPU — no TPU involved, so it runs (and is reported)
    even when the tunnel is down. Returns comparisons/sec on this host."""
    import numpy as np

    from cmh_tpu.native import hash_ops

    if not hash_ops.available():
        return None
    rng = np.random.RandomState(0)
    words = bits // 32
    gallery = rng.randint(0, 2**32, size=(n, words), dtype=np.uint32)
    hash_ops.hamming_topk(gallery[:4], gallery, topk)  # warm (thread spawn)
    times = []
    for _ in range(runs):
        queries = rng.randint(0, 2**32, size=(q, words), dtype=np.uint32)
        t0 = time.perf_counter()
        hash_ops.hamming_topk(queries, gallery, topk)
        times.append(time.perf_counter() - t0)
    return q * n / sorted(times)[len(times) // 2]


def _serving_cpu_extra():
    try:
        rate = bench_serving_cpu()
        return {"serving_cpu_topk_cmp_per_sec_host": (
            round(rate, 1) if rate is not None else None)}
    except Exception:
        return {"serving_cpu_topk_cmp_per_sec_host": None}


def _artifact_extras():
    """Committed measurement artifacts (tools/artifacts/*.json) that don't
    need the tunnel: the torch-CPU reference epoch cost at the full-scale
    protocol and any epoch A/B ratios measured against it. Clearly keyed as
    artifacts — these are machine-local measured records, not chip numbers
    from this bench run."""
    art_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "tools", "artifacts")
    out = {}
    try:
        with open(os.path.join(art_dir, "ref_epoch_full.json")) as f:
            ref = json.load(f)
        times = ref["ref_epoch_times_s"]
        out["artifact_ref_epoch_s_torch_cpu_full_scale"] = (
            times[-1] if len(times) > 1 else times[0])
    except Exception:
        pass
    for name, key in (
        ("epoch_ab_cpu_full.json", "artifact_epoch_ab_full_scale_cpu_vs_cpu"),
        ("epoch_ab_tpu_full.json", "artifact_epoch_ab_full_scale_tpu_vs_torch_cpu"),
    ):
        try:
            with open(os.path.join(art_dir, name)) as f:
                ab = json.load(f)
            out[key] = {"speedup": ab.get("speedup"),
                        "ours_epoch_s": ab.get("ours_epoch_s"),
                        "ref_epoch_s": ab.get("ref_epoch_s"),
                        "backend_ours": ab.get("backend_ours"),
                        "denominator_basis": ab.get("denominator_basis")}
        except Exception:
            pass
    # a full bench line captured by the recovery battery on a live tunnel
    # (tools/when_up.sh → collect_battery.py); if the tunnel is down again
    # when the driver runs this bench, these are the freshest chip numbers
    try:
        path = os.path.join(art_dir, "battery", "bench_tpu.json")
        with open(path) as f:
            bat = json.load(f)
        if bat.get("value"):
            out["artifact_battery_bench_tpu"] = {
                "value": bat.get("value"),
                "unit": bat.get("unit"),
                "extra": {k: v for k, v in (bat.get("extra") or {}).items()
                          if not k.startswith("artifact_")},
                # collector stamps the capture time into the JSON; mtime is
                # only a fallback (it reads as checkout time after a clone)
                "captured_at_utc": bat.get("captured_at_utc") or
                time.strftime("%Y-%m-%dT%H:%M:%SZ",
                              time.gmtime(os.path.getmtime(path))),
            }
    except Exception:
        pass
    return out


def main():
    def stage(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    # Every stage runs in a KILLABLE subprocess. A wedged TPU tunnel
    # (observed this round: the backend handshake hangs inside the PJRT C
    # call, where neither SIGALRM nor python-level timeouts can reach) must
    # never keep the driver from getting the JSON line — subprocess.run's
    # kill-on-timeout is the only reliable guard. A global deadline caps
    # the stage budgets.
    deadline = time.monotonic() + float(os.environ.get("BENCH_BUDGET_S", 5400))

    def _budget(stage_s):
        return max(1, int(min(stage_s, deadline - time.monotonic())))

    def _child_call(expr, stage_s, default):
        if deadline - time.monotonic() <= 5:
            return default
        code = (
            "import json, sys, os; os.environ['CMH_TPU_FUSED'] = '0';"
            "sys.path.insert(0, %r); import bench;"
            "bench._configure_jax(); v = %s;"
            "print('@RESULT@' + json.dumps(v))"
            % (os.path.dirname(os.path.abspath(__file__)), expr)
        )
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                timeout=_budget(stage_s), text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            for line in proc.stdout.strip().splitlines()[::-1]:
                if line.startswith("@RESULT@"):
                    return json.loads(line[len("@RESULT@"):])
            stage(f"stage produced no result (rc={proc.returncode}): "
                  + (proc.stderr or "")[-300:].replace("\n", " "))
        except Exception as e:
            stage(f"stage failed: {type(e).__name__}")
        return default

    device_str = _child_call("str(__import__('jax').devices()[0])", 300,
                             "unreachable")
    if device_str == "unreachable":
        # one retry, then bail fast: a wedged tunnel would otherwise eat
        # every stage budget just to produce the same nulls
        stage("device probe failed — retrying once")
        device_str = _child_call("str(__import__('jax').devices()[0])", 180,
                                 "unreachable")
    if device_str == "unreachable":
        stage("backend unreachable — emitting degraded line")
        print(json.dumps({
            "metric": "hamming_comparisons_per_sec_per_chip", "value": 0.0,
            "unit": "pairs/s", "vs_baseline": 0.0,
            "extra": {
                "encode_pairs_per_sec_per_chip": None,
                "map_at_all_eval_time_s_64bit_4dir_coco_scale": None,
                "map_at_all_eval_time_s_16bit_4dir_coco_scale": None,
                "train_step_pairs_per_sec_per_chip": None,
                "eval_codegen_items_per_sec_per_chip": None,
                "serving_device_topk_cmp_per_sec_per_chip_10m": None,
                "device": "unreachable",
                "error": "TPU backend unreachable (tunnel down)",
                **_serving_cpu_extra(),
                **_artifact_extras(),
            },
        }))
        return
    stage(f"device: {device_str}")
    stage("hamming kernel (subprocess)")
    hamming_rate = _child_call("bench.bench_hamming(bits=64)", 2400, 0.0)
    stage(f"hamming: {hamming_rate:.3e} cmp/s")
    stage("encode (subprocess)")
    encode_rate = _child_call("bench.bench_encode_best()", 2400, None)
    stage(f"encode: {encode_rate}")
    stage("map eval (subprocess)")
    map_time, map_time_16 = bench_map_eval_subprocess(timeout_s=_budget(1500))
    stage(f"map 4dir: 64-bit {map_time}, 16-bit {map_time_16}")
    stage("train step (subprocess)")
    train_rate, codegen_rate = bench_train_subprocess(timeout_s=_budget(1800))
    stage(f"train: {train_rate}, eval codegen: {codegen_rate}")
    stage("device serving 10M (subprocess)")
    serving_dev = _child_call("bench.bench_serving_device()", 1200, None)
    stage(f"device serving: {serving_dev}")
    if isinstance(serving_dev, dict):
        serving_forensics = {
            "serving_select_path": serving_dev.get("select"),
            "serving_run_times_s": serving_dev.get("times_s"),
            "serving_device_topk_best_cmp_per_sec_per_chip_10m": (
                round(serving_dev["best_cmp_per_sec"], 1)
                if serving_dev.get("best_cmp_per_sec") else None),
        }
        serving_dev = serving_dev.get("cmp_per_sec")
    else:
        serving_forensics = {}

    result = {
        "metric": "hamming_comparisons_per_sec_per_chip",
        "value": round(hamming_rate, 1),
        "unit": "pairs/s",
        "vs_baseline": round(hamming_rate / 1e8, 2),
        "extra": {
            "encode_pairs_per_sec_per_chip": (
                round(encode_rate, 2) if encode_rate is not None else None
            ),
            "map_at_all_eval_time_s_64bit_4dir_coco_scale": (
                round(map_time, 3) if map_time is not None else None
            ),
            "map_at_all_eval_time_s_16bit_4dir_coco_scale": (
                round(map_time_16, 3) if map_time_16 is not None else None
            ),
            "train_step_pairs_per_sec_per_chip": (
                round(train_rate, 2) if train_rate is not None else None
            ),
            "eval_codegen_items_per_sec_per_chip": (
                round(codegen_rate, 2) if codegen_rate is not None else None
            ),
            "serving_device_topk_cmp_per_sec_per_chip_10m": (
                round(serving_dev, 1) if serving_dev is not None else None
            ),
            **serving_forensics,
            "device": device_str,
            **_serving_cpu_extra(),
            **_artifact_extras(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
