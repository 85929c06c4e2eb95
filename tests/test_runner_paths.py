"""Trainer lifecycle paths not covered elsewhere: test mode, resume,
DCMHT cosine branch, CLI entry."""

import pytest
import os

import jax
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import torch

from util_methods import run_steps, tiny_trainer


def test_resume_and_test_mode(tmp_path):
    tr = tiny_trainer(tmp_path / "a", "DCMHT", "DCMHTTrainer",
                      model_extra={"hash_func": "softmax"})
    run_steps(tr, n=2)
    tr.save_model(str(tmp_path / "a"), epoch=0)
    model_file = [f for f in os.listdir(tmp_path / "a") if f.startswith("model-")][0]
    path = str(tmp_path / "a" / model_file)

    # a fresh trainer resuming weights reproduces the saved codes
    tr2 = tiny_trainer(tmp_path / "b", "DCMHT", "DCMHTTrainer",
                       model_extra={"hash_func": "softmax"},
                       run_extra={"resume_model": path, "is_train": False})
    batch = next(iter(tr2.query_loader))
    db = {k: jnp.asarray(v) for k, v in batch.items()}
    img1, _ = tr.generate_hash(db)
    img2, _ = tr2.generate_hash(db)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=1e-5)

    # test() computes 4 mAPs and writes test.mat
    maps = tr2.test()
    assert all(0 <= m <= 1 for m in maps)
    assert os.path.exists(os.path.join(tr2.save_dir, "mat_files", "test.mat"))


def test_dcmht_cosine_branch(tmp_path):
    """Cosine similarity branch: loss matches the reference formula
    (DCMHT.py:99-103) and trains without NaN."""
    from cmh_tpu.models.dcmht import _similarity_loss

    rng = np.random.RandomState(0)
    a = np.abs(rng.rand(6, 16)).astype(np.float32) + 0.1
    b = np.abs(rng.rand(6, 16)).astype(np.float32) + 0.1
    ls = (rng.rand(6, 6) > 0.5).astype(np.float32)
    got_p, got_n = _similarity_loss(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(ls), output_dim=8,
        vartheta=0.75, threshold=0.1, similarity_function="cosine",
    )
    ta = torch.tensor(a / np.linalg.norm(a, axis=-1, keepdims=True))
    tb = torch.tensor(b / np.linalg.norm(b, axis=-1, keepdims=True))
    sim = ta.mm(tb.t()).clip(min=0.1).clip(max=0.9)
    tls = torch.tensor(ls)
    want = float((-tls * torch.log(sim) - (1 - tls) * torch.log(1 - sim)).mean())
    assert abs(float(got_p) - want) < 1e-4
    assert float(got_p) == float(got_n)

    tr = tiny_trainer(tmp_path, "DCMHT", "DCMHTTrainer",
                      model_extra={"hash_func": "softmax",
                                   "similarity_function": "cosine"})
    losses = run_steps(tr, n=3)
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    """python main.py runs a full tiny train+valid through the real argparse
    surface (CPU-forced via CMH_TPU_PLATFORM)."""
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        """
model:
  arch: DCMHT
  clip_path: /nonexistent.pt
  clip_variant: tiny
  hash_func: softmax
optimizer:
  arch: BertAdam
  lr: 0.002
dataset:
  arch: synthetic_dataset
  name: synthetic
  num_classes: 4
  image_resolution: 32
  max_word: 12
run:
  arch: DCMHTTrainer
  output_dim: 8
  batch_size: 16
  is_train: True
  train_num: 32
  query_num: 16
  epochs: 1
  display_step: 1000
"""
    )
    env = dict(os.environ, CMH_TPU_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "main.py", "--config-file", str(cfg),
         "--save-dir", str(tmp_path / "out")],
        capture_output=True, text=True, timeout=420, env=env,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # timestamped save dir with mat artifacts and a model snapshot
    stamps = os.listdir(tmp_path / "out")
    assert len(stamps) == 1
    run_dir = tmp_path / "out" / stamps[0]
    assert os.path.exists(run_dir / "mat_files" / "last.mat")
    assert any(f.startswith("model-") for f in os.listdir(run_dir))
    log_files = os.listdir(run_dir / "log")
    assert log_files, "log file missing"


def test_orbax_checkpoint_roundtrip(tmp_path):
    tr = tiny_trainer(tmp_path / "ck", "DCMHT", "DCMHTTrainer",
                      model_extra={"hash_func": "softmax"}, batch=8)
    run_steps(tr, n=1)
    step_before = int(tr.state.step)
    leaf_before = np.asarray(
        jax.tree_util.tree_leaves(tr.state.params)[0]
    ).copy()
    tr.save_checkpoint_orbax(str(tmp_path / "orbax_ckpt"))
    run_steps(tr, n=1)  # mutate state
    tr.load_checkpoint_orbax(str(tmp_path / "orbax_ckpt"))
    assert int(tr.state.step) == step_before
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(tr.state.params)[0]), leaf_before
    )


def test_multi_host_init_plumbing(monkeypatch):
    """main.maybe_init_distributed forwards coordinator/process args from the
    config to jax.distributed.initialize (VERDICT r2 #7: a typo here should
    fail CI, not a pod run)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import main as cli
    from cmh_tpu.config import ConfigNode

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: calls.append(kw),
    )

    # single-host configs never touch jax.distributed
    cfg = ConfigNode({"run": {}})
    assert cli.maybe_init_distributed(cfg) is False
    assert calls == []

    # multi-host forwards every field
    cfg = ConfigNode({"run": {
        "multi_host": True,
        "distributed_addr": "10.0.0.7",
        "distributed_port": 8476,
        "num_processes": 4,
        "process_id": 2,
    }})
    assert cli.maybe_init_distributed(cfg) is True
    assert calls == [{
        "coordinator_address": "10.0.0.7:8476",
        "num_processes": 4,
        "process_id": 2,
    }]

    # defaults: localhost:12345, auto-detected process topology
    cfg = ConfigNode({"run": {"multi_host": True}})
    cli.maybe_init_distributed(cfg)
    assert calls[-1] == {
        "coordinator_address": "localhost:12345",
        "num_processes": None,
        "process_id": None,
    }


def test_save_model_once_dedupes_same_epoch(tmp_path):
    """valid() calls save_model for each direction that hits a new best; when
    both i2t and t2i improve in one epoch that used to write the identical
    weights file twice (~13s each at full scale). save_model_once skips the
    second write; a new epoch (or explicit save_model) still writes."""
    from cmh_tpu.runners.base import BaseTrainer

    calls = []
    t = BaseTrainer.__new__(BaseTrainer)
    t.save_model = lambda save_dir, epoch, other="": calls.append(
        (save_dir, epoch, other)
    )
    t.save_model_once(str(tmp_path), 0)
    t.save_model_once(str(tmp_path), 0)   # same epoch: deduped
    t.save_model_once(str(tmp_path), 1)   # new epoch: writes
    t.save_model_once(str(tmp_path), 1, other="emergency-")  # distinct artifact
    assert calls == [(str(tmp_path), 0, ""), (str(tmp_path), 1, ""),
                     (str(tmp_path), 1, "emergency-")]


def test_checkpoint_meta_roundtrip_and_legacy(tmp_path):
    """save_checkpoint carries trainer bookkeeping (next epoch, step, best
    trackers); load restores it and returns the resume epoch. A legacy
    meta-less checkpoint (bare train state) still loads and resumes at 0."""
    import flax.serialization as ser

    tr = tiny_trainer(tmp_path / "a", "DCMHT", "DCMHTTrainer")
    tr.train_epoch(0)
    tr.max_mapi2t, tr.best_epoch_i = 0.75, 3
    ckpt = str(tmp_path / "full.msgpack")
    tr.save_checkpoint(ckpt, epoch=4)

    tr2 = tiny_trainer(tmp_path / "b", "DCMHT", "DCMHTTrainer")
    assert tr2.load_checkpoint(ckpt) == 4
    assert (tr2.max_mapi2t, tr2.best_epoch_i) == (0.75, 3)
    assert tr2.global_step == tr.global_step
    for pa, pb in zip(jax.tree_util.tree_leaves(tr.state.params),
                      jax.tree_util.tree_leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    legacy = str(tmp_path / "legacy.msgpack")
    with open(legacy, "wb") as f:
        f.write(ser.to_bytes(tr.state._asdict()))
    tr3 = tiny_trainer(tmp_path / "c", "DCMHT", "DCMHTTrainer")
    assert tr3.load_checkpoint(legacy) == 0
    np.testing.assert_array_equal(
        np.asarray(tr3.state.step), np.asarray(tr.state.step))


def test_auto_resume_after_crash(tmp_path, monkeypatch):
    """Crash in epoch 1 → emergency checkpoint; a restarted run with
    run.auto_resume finds it under the save root, resumes at epoch 1 with
    step count and best-mAP tracking intact, and finishes the remaining
    epochs only."""
    import pytest as _pytest

    tr_a = tiny_trainer(tmp_path / "a", "DCMHT", "DCMHTTrainer",
                        run_extra={"epochs": 2})
    orig = type(tr_a).train_epoch

    def crash_on_1(self, epoch):
        if epoch == 1:
            raise RuntimeError("injected crash")
        return orig(self, epoch)

    monkeypatch.setattr(type(tr_a), "train_epoch", crash_on_1)
    with _pytest.raises(RuntimeError, match="injected crash"):
        tr_a.train()
    assert (tmp_path / "a" / "emergency.ckpt.msgpack").exists()
    steps_per_epoch = tr_a.global_step  # epoch 0 completed
    best_after_0 = (tr_a.max_mapi2t, tr_a.max_mapt2i)
    monkeypatch.setattr(type(tr_a), "train_epoch", orig)

    tr_b = tiny_trainer(tmp_path / "b", "DCMHT", "DCMHTTrainer",
                        run_extra={"epochs": 2, "auto_resume": True,
                                   "checkpoint_every": 1})
    tr_b.train()
    # resumed at epoch 1: exactly one more epoch of steps ran
    assert tr_b.global_step == 2 * steps_per_epoch
    assert int(tr_b.state.step) == 2 * steps_per_epoch
    # best tracking carried across the restart (can only improve)
    assert tr_b.max_mapi2t >= best_after_0[0]
    # periodic checkpoint written with the post-epoch resume point
    assert (tmp_path / "b" / "checkpoint-last.msgpack").exists()
    tr_c = tiny_trainer(tmp_path / "c", "DCMHT", "DCMHTTrainer")
    assert tr_c.load_checkpoint(
        str(tmp_path / "b" / "checkpoint-last.msgpack")) == 2


def test_checkpoint_extra_meta_twdh_umoed(tmp_path):
    """Runner-specific best-tracking (TwDH per-short-dim, UMoED i2i/t2t)
    rides the checkpoint meta and survives a resume."""
    tr = tiny_trainer(tmp_path / "t", "TwDH", "TwDHTrainer",
                      model_extra={"long_dim": 16, "short_info": [8],
                                   "hash_func": "softmax"})
    tr.max_short[str(8)]["i2t"] = 0.5
    tr.best_epoch_short[str(8)]["i2t"] = 2
    ckpt = str(tmp_path / "t.msgpack")
    tr.save_checkpoint(ckpt, epoch=3)
    tr2 = tiny_trainer(tmp_path / "t2", "TwDH", "TwDHTrainer",
                       model_extra={"long_dim": 16, "short_info": [8],
                                    "hash_func": "softmax"})
    assert tr2.load_checkpoint(ckpt) == 3
    assert tr2.max_short[str(8)] == {"i2t": 0.5, "t2i": 0.0}
    assert tr2.best_epoch_short[str(8)]["i2t"] == 2

    um = tiny_trainer(tmp_path / "u", "UMoED", "UMoEDTrainer",
                      model_extra={"hash_func": "linear_subspace",
                                   "merge_func": "concatenate", "setDim": 8,
                                   "MoE": False, "fusion": True,
                                   "hidden_dim": 32, "decoder_heads": 2,
                                   "decoder_layers": 1, "dropout": 0.1,
                                   "distance_mode": "cosine",
                                   "distance": {"mode": "pairwise"},
                                   "chamfer": {"unif_alpha": 0.8,
                                               "token_triplet_margin": 0.1},
                                   "hash_pars": {"triplet_alpha": 1,
                                                 "triplet_margin": 0.3}})
    um.max_mapi2i, um.best_epoch_i2i = 0.9, 4
    ckpt_u = str(tmp_path / "u.msgpack")
    um.save_checkpoint(ckpt_u, epoch=5)
    um2 = tiny_trainer(tmp_path / "u2", "UMoED", "UMoEDTrainer",
                       model_extra={"hash_func": "linear_subspace",
                                    "merge_func": "concatenate", "setDim": 8,
                                    "MoE": False, "fusion": True,
                                    "hidden_dim": 32, "decoder_heads": 2,
                                    "decoder_layers": 1, "dropout": 0.1,
                                    "distance_mode": "cosine",
                                    "distance": {"mode": "pairwise"},
                                    "chamfer": {"unif_alpha": 0.8,
                                                "token_triplet_margin": 0.1},
                                    "hash_pars": {"triplet_alpha": 1,
                                                  "triplet_margin": 0.3}})
    assert um2.load_checkpoint(ckpt_u) == 5
    assert (um2.max_mapi2i, um2.best_epoch_i2i) == (0.9, 4)


def test_auto_resume_skips_foreign_config_checkpoints(tmp_path):
    """Auto-resume must never silently continue from a sibling run with a
    different config: the newest checkpoint under the save root wins only
    if its config fingerprint (method, dims, dataset counts, batch,
    optimizer hash) matches; foreign and legacy (fingerprint-less)
    candidates are skipped."""
    import flax.serialization as ser

    # matching run saves first (oldest mtime)
    tr_match = tiny_trainer(tmp_path / "x", "DCMHT", "DCMHTTrainer")
    ck_match = str(tmp_path / "x" / "checkpoint-last.msgpack")
    tr_match.save_checkpoint(ck_match, epoch=1)
    assert os.path.exists(ck_match + ".meta.json")

    # same method, different lr — same state STRUCTURE, foreign identity
    tr_foreign = tiny_trainer(tmp_path / "y", "DCMHT", "DCMHTTrainer",
                              optimizer_extra={"lr": 0.05})
    ck_foreign = str(tmp_path / "y" / "checkpoint-last.msgpack")
    tr_foreign.save_checkpoint(ck_foreign, epoch=7)

    # legacy fingerprint-less checkpoint (bare state, no sidecar)
    os.makedirs(tmp_path / "z", exist_ok=True)
    ck_legacy = str(tmp_path / "z" / "checkpoint-last.msgpack")
    with open(ck_legacy, "wb") as f:
        f.write(ser.to_bytes(tr_match.state._asdict()))

    # force mtime order: matching oldest, foreign newer, legacy newest
    now = os.path.getmtime(ck_match)
    os.utime(ck_match, (now, now))
    os.utime(ck_foreign, (now + 10, now + 10))
    os.utime(ck_legacy, (now + 20, now + 20))

    tr_new = tiny_trainer(tmp_path / "w", "DCMHT", "DCMHTTrainer")
    assert tr_new._find_resume_checkpoint() == ck_match
    assert tr_new.load_checkpoint(ck_match) == 1

    # fingerprint readable from the msgpack meta too (sidecar deleted)
    os.remove(ck_match + ".meta.json")
    assert tr_new._find_resume_checkpoint() == ck_match

    # nothing matches → fresh start (None), not the newest foreign one
    os.remove(ck_match)
    assert tr_new._find_resume_checkpoint() is None

    # a DIFFERENT-config trainer resumes its own, not the legacy/newest
    tr_foreign2 = tiny_trainer(tmp_path / "v", "DCMHT", "DCMHTTrainer",
                               optimizer_extra={"lr": 0.05})
    assert tr_foreign2._find_resume_checkpoint() == ck_foreign


@pytest.mark.slow
def test_load_checkpoint_structure_mismatch_clear_error(tmp_path):
    """A checkpoint from a different method must fail with a named error
    pointing at the file, not a deep KeyError."""
    import pytest as _pytest

    tr = tiny_trainer(tmp_path / "a", "DCMHT", "DCMHTTrainer")
    ckpt = str(tmp_path / "a.msgpack")
    tr.save_checkpoint(ckpt, epoch=1)
    other = tiny_trainer(tmp_path / "b", "MITH", "MITHTrainer")
    with _pytest.raises(ValueError, match="does not match this trainer"):
        other.load_checkpoint(ckpt)


@pytest.mark.slow
def test_preemption_sigterm_saves_and_resumes(tmp_path):
    """SIGTERM mid-training (how TPU pods are reclaimed — the reference has
    no preemption handling at all, runners/base.py:379-384 keeps only
    best-mAP weights) → full-state emergency save + clean exit 0; the SAME
    restarted command (run.auto_resume) continues past the preemption point.
    The fingerprint includes the schedule's t_total, so the restart must use
    the identical config — the second run is preempted again once its
    checkpoint meta proves it progressed beyond the first run's state."""
    import json
    import signal
    import time as _time

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        """
model:
  arch: DCMHT
  clip_path: /nonexistent.pt
  clip_variant: tiny
  hash_func: softmax
optimizer:
  arch: BertAdam
  lr: 0.002
dataset:
  arch: synthetic_dataset
  name: synthetic
  num_classes: 4
  image_resolution: 32
  max_word: 12
run:
  arch: DCMHTTrainer
  output_dim: 8
  batch_size: 16
  is_train: True
  train_num: 32
  query_num: 16
  epochs: 200
  display_step: 1000
  auto_resume: True
  checkpoint_every: 1
"""
    )
    env = dict(os.environ, CMH_TPU_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    out_root = tmp_path / "out"

    def max_meta_epoch():
        best = -1
        for stamp in os.listdir(out_root) if out_root.exists() else []:
            for name in ("checkpoint-last.msgpack.meta.json",
                         "emergency.ckpt.msgpack.meta.json"):
                f = out_root / stamp / name
                if f.exists():
                    try:
                        best = max(best, json.loads(f.read_text())["epoch"])
                    except Exception:
                        pass
        return best

    def run_and_preempt():
        """Start training; SIGTERM once checkpoint meta moves PAST its
        value at spawn time — new meta can only come from this child's
        epoch loop, which proves the SIGTERM handler is installed (the
        previous run may have raced ahead of its own preemption, so an
        absolute epoch target could trigger during the next child's
        interpreter startup and kill it with the default action). Returns
        (returncode, combined output). A drainer thread keeps the stdout
        pipe from filling (a blocked child never checkpoints)."""
        import threading

        baseline = max_meta_epoch()
        proc = subprocess.Popen(
            [sys.executable, "main.py", "--config-file", str(cfg),
             "--save-dir", str(out_root)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd="/root/repo",
        )
        chunks = []
        drainer = threading.Thread(
            target=lambda: chunks.append(proc.stdout.read()), daemon=True)
        drainer.start()
        try:
            deadline = _time.monotonic() + 420
            while _time.monotonic() < deadline:
                if max_meta_epoch() > baseline:
                    break
                if proc.poll() is not None:
                    drainer.join(timeout=60)
                    raise AssertionError(
                        "training exited before preemption: "
                        + "".join(chunks)[-2000:])
                _time.sleep(1)
            else:
                raise AssertionError(
                    f"checkpoint meta never passed {baseline}")
            proc.send_signal(signal.SIGTERM)
            proc.wait(timeout=180)
            drainer.join(timeout=60)
        finally:
            if proc.poll() is None:
                proc.kill()
        return proc.returncode, "".join(chunks)

    # first run: completes at least epoch 0, preempted mid-run
    rc, out = run_and_preempt()
    assert rc == 0, out[-2000:]
    assert "preempted (SIGTERM)" in out, out[-2000:]
    stamps = os.listdir(out_root)
    assert any((out_root / s / "emergency.ckpt.msgpack").exists()
               for s in stamps), f"no emergency checkpoint under {stamps}"
    after_first = max_meta_epoch()
    assert after_first >= 1

    # identical restarted command: must log the resume and then progress
    # past everything the first run left behind (the "resum" line is the
    # authoritative check; new checkpoint meta times the second SIGTERM)
    rc2, out2 = run_and_preempt()
    assert rc2 == 0, out2[-2000:]
    assert "resum" in out2.lower(), out2[-2000:]
    assert "preempted (SIGTERM)" in out2, out2[-2000:]
    assert max_meta_epoch() > after_first


def test_fingerprint_covers_model_and_suboptimizer_hparams(tmp_path):
    """The fingerprint must change when method hyperparameters or
    method-specific optimizer groups change (structure-identical foreign
    runs — e.g. DSPH with a different proxy-SGD lr — previously hashed
    identically and could silently cross-resume)."""
    base = dict(model_extra={"hash_func": "tanh", "numclass": 4,
                             "alpha": 0.8},
                optimizer_extra={"hyp": {"lr": 0.02}})
    tr_a = tiny_trainer(tmp_path / "a", "DSPH", "DSPHTrainer", **base)
    fp_a = tr_a._config_fingerprint()

    tr_b = tiny_trainer(tmp_path / "b", "DSPH", "DSPHTrainer",
                        model_extra=base["model_extra"],
                        optimizer_extra={"hyp": {"lr": 0.5}})
    assert tr_b._config_fingerprint() != fp_a, "hyp lr must break the print"

    tr_c = tiny_trainer(tmp_path / "c", "DSPH", "DSPHTrainer",
                        model_extra={"hash_func": "tanh", "numclass": 4,
                                     "alpha": 0.3},
                        optimizer_extra=base["optimizer_extra"])
    assert tr_c._config_fingerprint() != fp_a, "model alpha must break it"

    tr_d = tiny_trainer(tmp_path / "d", "DSPH", "DSPHTrainer", **base)
    assert tr_d._config_fingerprint() == fp_a, "identical config must match"


def test_auto_resume_survives_truncated_checkpoint(tmp_path):
    """A checkpoint truncated by an ungraceful kill (valid sidecar, corrupt
    msgpack) must not brick auto_resume: the loader falls back to the next
    matching candidate, or to a fresh start."""
    tr_a = tiny_trainer(tmp_path / "a", "DCMHT", "DCMHTTrainer")
    ck_good = str(tmp_path / "a" / "checkpoint-last.msgpack")
    tr_a.save_checkpoint(ck_good, epoch=1)

    tr_b = tiny_trainer(tmp_path / "b", "DCMHT", "DCMHTTrainer")
    ck_bad = str(tmp_path / "b" / "checkpoint-last.msgpack")
    tr_b.save_checkpoint(ck_bad, epoch=1)
    with open(ck_bad, "r+b") as f:  # simulate mid-write SIGKILL
        f.truncate(100)
    now = os.path.getmtime(ck_good)
    os.utime(ck_good, (now, now))
    os.utime(ck_bad, (now + 10, now + 10))  # corrupt one is newest

    tr_new = tiny_trainer(tmp_path / "c", "DCMHT", "DCMHTTrainer",
                          run_extra={"epochs": 1, "auto_resume": True})
    cands = list(tr_new._resume_candidates())
    assert cands[0] == ck_bad and ck_good in cands
    tr_new.train()  # must fall back to ck_good (epoch 1 → nothing to run)
    assert int(tr_new.state.step) == int(tr_a.state.step)

    # only corrupt candidates at all → fresh start, train still completes
    os.remove(ck_good)
    os.remove(ck_good + ".meta.json")
    tr_fresh = tiny_trainer(tmp_path / "d", "DCMHT", "DCMHTTrainer",
                            run_extra={"epochs": 1, "auto_resume": True})
    tr_fresh.train()
    assert int(tr_fresh.state.step) > 0


def test_missing_resume_model_fails_loudly(tmp_path):
    """A provided-but-missing weights file must raise, not silently fall
    back to random init (which would report random-weight mAPs as the
    model's test result)."""
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="does not exist"):
        tiny_trainer(tmp_path, "DCMHT", "DCMHTTrainer",
                     run_extra={"is_train": False,
                                "resume_model": str(tmp_path / "nope.msgpack")})


def test_auto_resume_rolls_back_after_partial_load(tmp_path, monkeypatch):
    """If a fingerprint-matching candidate mutates trainer state and THEN
    fails (e.g. an older extra-meta schema), the fresh-start fallback must
    run from pristine init, not the rejected checkpoint's weights."""
    tr_a = tiny_trainer(tmp_path / "a", "DCMHT", "DCMHTTrainer")
    tr_a.save_checkpoint(str(tmp_path / "a" / "checkpoint-last.msgpack"),
                         epoch=1)

    tr_b = tiny_trainer(tmp_path / "b", "DCMHT", "DCMHTTrainer",
                        run_extra={"epochs": 1, "auto_resume": True})
    pristine_leaf = np.asarray(
        jax.tree_util.tree_leaves(tr_b.state.params)[0]).copy()

    orig = type(tr_b).load_checkpoint

    def poisoned(self, path):
        out = orig(self, path)          # mutates self.state + trackers
        self.global_step = 777
        raise KeyError("simulated older extra-meta schema")

    monkeypatch.setattr(type(tr_b), "load_checkpoint", poisoned)
    tr_b.train()  # falls back to fresh start
    monkeypatch.setattr(type(tr_b), "load_checkpoint", orig)
    assert tr_b.global_step != 777, "rollback must clear partial mutations"
    # one fresh epoch from step 0: step count equals one epoch's batches
    assert int(tr_b.state.step) == len(tr_b.train_loader)
