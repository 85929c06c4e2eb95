"""Trainer: full train/eval lifecycle over jitted XLA programs.

Functional re-design of the reference BaseTrainer
(/root/reference/runners/base.py:22-414). Same lifecycle — build dataset →
model → optimizer, epoch loop of train_epoch + valid, 4-direction mAP with
best-tracking and ``.mat``/model artifacts — but the hot paths are single
compiled XLA programs:

- ``train_step``: forward (backbone + head) + loss + BertAdam update fused
  into one jit (the reference runs a python optimizer loop per step).
- ``encode_step``: no-grad image/text encoding for eval code generation.
- mAP: ``ops.metrics.calc_map_k`` on device (the reference sorts on CPU with
  a python loop per query, calc_utils.py:58-92).

Multi-device data parallelism replaces DDP+DistributedSampler+all_reduce
(runners/base.py:96-112,172-197,260-264) with a mesh: the global batch is
sharded over the ``dp`` axis inside jit, params stay replicated, and XLA
inserts the gradient psum — see ``parallel/mesh.py``.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigNode
from ..data.builder import build_dataloader
from ..data.loader import HostDataLoader
from ..models.base import Method
from ..optim.bert_adam import bert_adam, scheduled_lr_factor
from ..optim.partition import partitioned_optimizer
from ..ops.metrics import calc_map_k
from ..registry import registry
from ..utils.logger import get_color_logger
from ..utils.seed import set_seed


class PreemptionRequested(Exception):
    """SIGTERM arrived mid-training (how TPU pods are reclaimed). The
    train loop converts it into a full-state emergency save + clean exit
    so the restarted command continues via ``run.auto_resume`` — the
    reference has no preemption story at all (a killed rank just loses
    everything past the last best-mAP weights, runners/base.py:379-384)."""


class TrainState(NamedTuple):
    params: Any
    model_state: Dict[str, Any]   # mutable flax collections (batch_stats, …)
    opt_state: Any
    method_state: Dict[str, Any]  # memory banks, centers, … (method-owned)
    step: jax.Array


class BaseTrainer:
    def __init__(
        self,
        cfg: ConfigNode,
        is_train: bool = True,
        logger=None,
        device=None,
        world_size: int = 1,
        output_dim: int = 16,
        train_num: int = 10000,
        query_num: int = 5000,
        epochs: int = 100,
        save_dir: str = "./result",
        display_step: int = 20,
        top_k: Optional[int] = None,
        model_state: str = "",
        batch_size: int = 128,
        distributed: bool = False,
        auto_run: bool = True,
        **kwargs,
    ) -> None:
        self.cfg = cfg
        self.rng = set_seed(cfg.run.get("seed", 1814))
        self.logger = logger or get_color_logger(
            cfg.run.get("log_dir"),
            str(cfg.dataset.get("name", "dataset")) + "-" + str(device or 0),
        )
        self.logger.info(f"parameters: {cfg.to_dict()}")
        self.is_train = is_train
        self.device = device
        self.world_size = world_size
        self.distributed = distributed
        self.output_dim = output_dim
        self.train_num = train_num
        self.query_num = query_num
        self.epochs = epochs
        self.display_step = display_step
        self.top_k = top_k
        self.model_state = model_state
        self.batch_size = batch_size
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)

        self.global_step = 0
        self.max_mapi2t = 0.0
        self.max_mapt2i = 0.0
        self.best_epoch_i = 0
        self.best_epoch_t = 0
        self.loss_type = kwargs.get("loss_type", "l1")

        # observability: optional XLA profiler trace of the first train steps
        # (the reference has no profiling — SURVEY.md §5); view with
        # tensorboard/xprof or perfetto
        self.profile_dir = cfg.run.get("profile_dir", None)
        self.profile_steps = cfg.run.get("profile_steps", 5)
        self._profiling = False

        self.calc_map_k = calc_map_k
        self._t_total = -1

        # device mesh for data parallelism (replaces DDP/NCCL — see
        # parallel/mesh.py); single-device runs use no mesh
        self.mesh = None
        if distributed or cfg.run.get("distribute", False):
            from ..parallel.mesh import make_mesh

            self.mesh = make_mesh(
                n_devices=world_size if world_size > 1 else None,
                tp=cfg.run.get("tp", 1),
            )
            self.logger.info(f"mesh: {self.mesh}")

        self.build_dataset(
            cfg.dataset,
            train_num=train_num,
            query_num=query_num,
            batch_size=batch_size,
            shuffle=cfg.run.get("shuffle", True),
        )
        self.build_model(cfg.model, output_dim=output_dim)
        self.build_optimizer(cfg.optimizer)
        self._compile_steps()

        if auto_run:
            self.run()

    # ------------------------------------------------------------------ data
    def build_dataset(self, cfg_dataset, train_num=10000, query_num=5000,
                      batch_size=128, shuffle=True):
        dataname = cfg_dataset.get("name", "synthetic")
        path = cfg_dataset.get("path", "./data")
        self.logger.info(f"Using {dataname} dataset.")
        image_file = os.path.join(path, dataname, cfg_dataset.get("img_file", "index.mat"))
        text_file = os.path.join(path, dataname, cfg_dataset.get("txt_file", "caption.mat"))
        label_file = os.path.join(path, dataname, cfg_dataset.get("label_file", "label.mat"))
        max_word = cfg_dataset.get("max_word", 32)
        image_resolution = cfg_dataset.get("image_resolution", 224)
        dataset_cls = cfg_dataset.get("arch", "transformer_dataset")
        tokenizer_cls = registry.get_tokenizer_class(
            cfg_dataset.get("tokenizer_arch", "clip_tokenizer")
        )
        tokenizer = tokenizer_cls() if tokenizer_cls else None

        extra = {}
        if dataset_cls == "synthetic_dataset":
            extra["num_classes"] = cfg_dataset.get("num_classes", 8)
            extra["num_items"] = cfg_dataset.get(
                "num_items", query_num + 2 * train_num
            )

        train_data, query_data, retrieval_data = build_dataloader(
            captionFile=text_file, indexFile=image_file, labelFile=label_file,
            imageResolution=image_resolution, maxWords=max_word,
            query_num=query_num, train_num=train_num, dataset_cls=dataset_cls,
            tokenizer=tokenizer, **extra,
        )
        self.build_loader(train_data, query_data, retrieval_data,
                          batch_size=batch_size, shuffle=shuffle)

    def build_loader(self, train_data, query_data, retrieval_data,
                     batch_size=128, shuffle=True):
        self.train_labels = jnp.asarray(train_data.get_all_label())
        self.query_labels = jnp.asarray(query_data.get_all_label())
        self.retrieval_labels = jnp.asarray(retrieval_data.get_all_label())
        self.retrieval_num = int(self.retrieval_labels.shape[0])
        self.logger.info(f"train shape: {self.train_labels.shape}")
        self.logger.info(f"query shape: {self.query_labels.shape}")
        self.logger.info(f"retrieval shape: {self.retrieval_labels.shape}")

        workers = self.cfg.run.get("num_workers", 0)
        # eval batches can be much larger than train batches (no activations
        # to store) — fewer device dispatches for the code-generation sweep
        eval_batch = self.cfg.run.get("eval_batch_size", batch_size)
        if self.mesh is not None:
            from ..parallel.mesh import check_batch_divisible

            check_batch_divisible(batch_size, self.mesh, "run.batch_size")
            check_batch_divisible(eval_batch, self.mesh, "run.eval_batch_size")
        self.train_loader = HostDataLoader(
            train_data, batch_size=batch_size, shuffle=shuffle,
            pad_to_batch=True, num_workers=workers,
        )
        self.query_loader = HostDataLoader(
            query_data, batch_size=eval_batch, shuffle=False,
            pad_to_batch=True, num_workers=workers,
        )
        self.retrieval_loader = HostDataLoader(
            retrieval_data, batch_size=eval_batch, shuffle=False,
            pad_to_batch=True, num_workers=workers,
        )

    # ----------------------------------------------------------------- model
    def build_model(self, cfg_model, output_dim=16):
        arch = cfg_model.get("arch", "DCMHT")
        method_cls = registry.require_model_class(arch)
        self.method: Method = method_cls.from_config(
            cfg_model, output_dim=output_dim, train_num=self.train_num
        )
        # methods with train-set-sized state (MITH memory banks, TwDH
        # centers) need the label matrix before init_method_state runs
        self.method.train_labels = self.train_labels

        sample = next(iter(self.query_loader))
        self.rng, init_key = jax.random.split(self.rng)
        variables = self.method.init_variables(init_key, sample)
        clip_path = cfg_model.get("clip_path", "./ViT-B-32.pt")
        variables, loaded = self.method.load_pretrained_backbone(variables, clip_path)
        self.logger.info(
            "backbone: %s", "loaded pretrained CLIP" if loaded
            else f"random init ({clip_path} not found)"
        )
        variables = dict(variables)
        params = variables.pop("params")
        self._params0 = params
        self._model_state0 = variables  # batch_stats etc. (may be empty)

        if self.model_state:
            # a provided-but-missing weights file must fail loudly — falling
            # through to random init would report random-weight mAPs as the
            # model's test result
            if not os.path.isfile(self.model_state):
                raise FileNotFoundError(
                    f"run.resume_model points at {self.model_state!r}, "
                    "which does not exist"
                )
            self.logger.info("loading model...")
            self._params0, self._model_state0 = self.load_model_file(
                self.model_state, self._params0, self._model_state0
            )

        self.logger.info("Building model!")
        self.logger.info(f"Output dim: {self.output_dim}")

    # ------------------------------------------------------------- optimizer
    def build_optimizer(self, cfg_optimizer):
        # the reference reads "backbone_lr" while its YAMLs write "clip_lr"
        # (configs/DCMHT/config.yaml:25 vs runners/base.py:124) — accept both
        backbone_lr = cfg_optimizer.get(
            "backbone_lr", cfg_optimizer.get("clip_lr", 0.00001)
        )
        lr = cfg_optimizer.get("lr", 0.001)
        self._t_total = len(self.train_loader) * self.epochs
        common = dict(
            warmup=cfg_optimizer.get("warmup_proportion", 0.1),
            t_total=self._t_total,
            schedule=cfg_optimizer.get("schedule", "warmup_cosine"),
            b1=cfg_optimizer.get("b1", 0.9),
            b2=cfg_optimizer.get("b2", 0.98),
            e=cfg_optimizer.get("e", 1e-6),
            weight_decay=cfg_optimizer.get("weight_decay", 0.2),
            max_grad_norm=cfg_optimizer.get("max_grad_norm", 1.0),
            # flattened update off-mesh: collapses the per-leaf op soup
            # (~25 ms/step of the ViT-B/32 train step) into whole-vector
            # ops; TP/DP shardings address the tree layout, so mesh runs
            # keep the tree path
            flat=cfg_optimizer.get("flat", self.mesh is None),
        )
        self._opt_cfg = dict(common, lr=lr, backbone_lr=backbone_lr)
        self._opt_cfg.pop("flat", None)
        transforms = {"backbone": bert_adam(lr=backbone_lr, **common)}
        transforms.update(self.extra_optimizers(cfg_optimizer))
        self.tx = partitioned_optimizer(transforms, default=bert_adam(lr=lr, **common))

        self.state = TrainState(
            params=self._params0,
            model_state=self._model_state0,
            opt_state=self.tx.init(self._params0),
            method_state=self.method.init_method_state(),
            step=jnp.zeros((), jnp.int32),
        )
        self.logger.info("Building optimizer!")

    def extra_optimizers(self, cfg_optimizer):
        """Hook: per-submodule optimizer overrides (e.g. SGD proxies)."""
        return {}

    # ------------------------------------------------------------- jit steps
    def _compile_steps(self):
        method = self.method
        tx = self.tx
        mutable_keys = list(self._model_state0.keys())
        self.rng, dropout_base = jax.random.split(self.rng)

        # memory knob: rematerialize the forward during backward instead of
        # storing activations (jax.checkpoint) — enables larger per-chip
        # batches at ~1.3× step FLOPs. cfg.run.remat: true
        use_remat = bool(self.cfg.run.get("remat", False))
        if use_remat and mutable_keys:
            self.logger.warning(
                "run.remat ignored: the model carries mutable collections "
                f"({mutable_keys}) which jax.checkpoint cannot wrap — "
                "activations will be stored"
            )

        def train_step(state: TrainState, batch):
            rngs = {"dropout": jax.random.fold_in(dropout_base, state.step)}

            def loss_fn(params):
                variables = {"params": params, **state.model_state}
                if mutable_keys:
                    outputs, new_model_state = method.module.apply(
                        variables, batch["image"], batch["text"],
                        batch["key_padding_mask"], train=True,
                        mutable=mutable_keys, rngs=rngs,
                    )
                else:
                    outputs = method.module.apply(
                        variables, batch["image"], batch["text"],
                        batch["key_padding_mask"], train=True, rngs=rngs,
                    )
                    new_model_state = {}
                loss, loss_dict, new_method_state = method.loss(
                    outputs, batch, state.method_state, state.step
                )
                return loss, (loss_dict, new_model_state, new_method_state)

            grad_target = (
                jax.checkpoint(loss_fn) if use_remat and not mutable_keys
                else loss_fn
            )
            (loss, (loss_dict, new_model_state, new_method_state)), grads = (
                jax.value_and_grad(grad_target, has_aux=True)(state.params)
            )
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.params, updates
            )
            new_state = TrainState(
                params=new_params,
                model_state=new_model_state,
                opt_state=new_opt_state,
                method_state=new_method_state,
                step=state.step + 1,
            )
            return new_state, loss, loss_dict

        def train_scan(state: TrainState, stacked_batch):
            """lax.scan of ``train_step`` over a leading steps axis.

            One dispatch + one fetch for N steps — on the tunneled backend a
            python loop of jitted calls pays a ~40ms relay dispatch per step
            (CLAUDE.md trap #3), which would dominate the per-step time and
            make throughput measurements read the tunnel instead of the
            chip. Batches are passed stacked as an argument (never closed
            over — trap #5: HBM constants blow the remote-compile request).
            """
            def body(s, b):
                s2, loss, loss_dict = train_step(s, b)
                return s2, (loss, loss_dict)

            return jax.lax.scan(body, state, stacked_batch)

        def encode_scan(params, model_state, buffers, stacked_batch):
            """Chained eval code generation: N loader batches encoded,
            binarized and scattered into the device code buffers in ONE
            dispatch (per-batch encode calls pay the ~40ms relay round-trip
            each on the tunneled backend — trap #3). Matches base
            ``get_code``'s encode → make_hash_code → masked scatter exactly;
            batches arrive stacked as an argument (trap #5)."""
            make = method.make_hash_code

            def body(bufs, b):
                hashes = encode_step(params, model_state, b)

                def upd(buf, h):
                    code = make(h).astype(buf.dtype)
                    safe = jnp.where(
                        b["valid"].astype(bool), b["index"], buf.shape[0]
                    )
                    return buf.at[safe].set(code, mode="drop")

                return jax.tree_util.tree_map(upd, bufs, hashes), None

            out, _ = jax.lax.scan(body, buffers, stacked_batch)
            return out

        def encode_step(params, model_state, batch):
            variables = {"params": params, **model_state}
            img = method.module.apply(
                variables, batch["image"], train=False,
                method=lambda m, x, train: m.encode_image(x, train=train),
            )
            txt = method.module.apply(
                variables, batch["text"], batch["key_padding_mask"], train=False,
                method=lambda m, t, k, train: m.encode_text(t, k, train=train),
            )
            return img, txt

        if self.mesh is not None:
            from ..parallel.mesh import TP_AXIS, batch_sharding, replicated

            rep = replicated(self.mesh)
            shard = batch_sharding(self.mesh)
            if self.mesh.shape[TP_AXIS] > 1:
                # Megatron-style backbone sharding over tp (parallel/tp.py);
                # params/optimizer moments carry the same layout
                from ..parallel.tp import state_shardings, tp_param_shardings

                state_sh = state_shardings(self.state, self.mesh)
                params_sh = tp_param_shardings(self.state.params, self.mesh)
            else:
                state_sh = rep
                params_sh = rep
            # batch sharded over dp; XLA inserts the gradient psum and the
            # tp-axis all-reduces on ICI
            self._train_step = jax.jit(
                train_step,
                in_shardings=(state_sh, shard),
                out_shardings=(state_sh, rep, rep),
                donate_argnums=(0,),
            )
            self._encode_step = jax.jit(
                encode_step,
                in_shardings=(params_sh, rep, shard),
                out_shardings=(rep, rep),
            )
        else:
            self._train_step = jax.jit(train_step, donate_argnums=(0,))
            self._encode_step = jax.jit(encode_step)
        self._train_scan = jax.jit(train_scan, donate_argnums=(0,))
        self._encode_scan = jax.jit(encode_scan, donate_argnums=(2,))
        # chain N steps per dispatch on the tunneled single-chip backend
        # (cfg.run.scan_steps); mesh runs keep per-step sharded dispatch
        self.scan_steps = (
            int(self.cfg.run.get("scan_steps", 1)) if self.mesh is None else 1
        )

    def _put_batch(self, batch):
        """Host batch → device(s): sharded over the dp axis under a mesh."""
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch

            return shard_batch(batch, self.mesh)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    # ------------------------------------------------------------------- run
    def run(self):
        if self.is_train:
            self.train()
        else:
            self.test()

    def _config_fingerprint(self) -> dict:
        """Identity of this run for resume safety: two runs may only resume
        each other's checkpoints if every field matches. Several experiments
        often share one save root (different bits / lr / dataset under
        ``out/``); structure alone cannot tell them apart — a same-method
        run with a different lr has an identical state tree and would resume
        silently with foreign weights and best-mAP tracking."""
        import hashlib
        import json

        def digest(obj) -> str:
            return hashlib.sha256(
                json.dumps(obj, sort_keys=True, default=str).encode()
            ).hexdigest()[:16]

        # hash the full CONFIG sections, not just the resolved subset:
        # method hyperparameters (dropout, alpha, mrg, ...) and
        # method-specific optimizer groups (DSPH optimizer.hyp, DNPH
        # optimizer.loss) change the trajectory without changing the state
        # tree's structure, so they must break the fingerprint too
        return {
            "method": str(self.cfg.model.get("arch", "")),
            "runner": type(self).__name__,
            "output_dim": int(self.output_dim),
            "dataset": str(self.cfg.dataset.get("name", "")),
            "train_num": int(self.train_num),
            "query_num": int(self.query_num),
            "retrieval_num": int(self.retrieval_num),
            "batch_size": int(self.batch_size),
            "optimizer_hash": digest(
                [self._opt_cfg, self.cfg.optimizer.to_dict()
                 if hasattr(self.cfg.optimizer, "to_dict") else {}]
            ),
            "model_hash": digest(
                self.cfg.model.to_dict()
                if hasattr(self.cfg.model, "to_dict") else {}
            ),
        }

    @staticmethod
    def _read_checkpoint_fingerprint(path: str) -> Optional[dict]:
        """Fingerprint of a checkpoint on disk, via the cheap JSON sidecar
        when present (written by ``save_checkpoint``), else by parsing the
        msgpack meta. None for legacy checkpoints without one."""
        import json

        sidecar = path + ".meta.json"
        if os.path.isfile(sidecar):
            try:
                with open(sidecar) as f:
                    return json.load(f).get("fingerprint")
            except (OSError, ValueError):
                pass  # unreadable sidecar: fall through to the msgpack meta
        try:
            # sidecar-less fallback, bounded: parsing the msgpack means
            # materializing the whole state blob just to read meta — fine
            # for the small checkpoints early code wrote, unacceptable for
            # multi-GB ones (several legacy siblings would stall every
            # startup); those are skipped (use run.resume_checkpoint)
            if os.path.getsize(path) > 512 * 1024 * 1024:
                return None
            import flax.serialization as ser

            with open(path, "rb") as f:
                raw_tree = ser.msgpack_restore(f.read())
            if isinstance(raw_tree, dict) and "meta" in raw_tree:
                return raw_tree["meta"].get("fingerprint")
        except Exception:
            pass
        return None

    def _find_resume_checkpoint(self) -> Optional[str]:
        """Newest full-state checkpoint under the save ROOT (the directory
        the user passed — each run nests in a timestamped subdir, so a
        restarted command scans its siblings) whose config fingerprint
        matches this run. Foreign siblings — same method with a different
        lr/batch/dataset, or a different method entirely — are skipped with
        a logged reason rather than silently resumed; legacy checkpoints
        without a fingerprint are likewise skipped (pass
        run.resume_checkpoint explicitly to load one)."""
        for path in self._resume_candidates():
            return path
        return None

    def _resume_candidates(self):
        """All fingerprint-matching resume candidates, newest first (the
        caller falls back to the next one if a load fails — e.g. a file
        truncated by an ungraceful kill predating the atomic-replace
        writes)."""
        import glob

        root = os.path.dirname(os.path.abspath(self.save_dir))
        candidates = glob.glob(
            os.path.join(root, "*", "checkpoint-last.msgpack")
        ) + glob.glob(os.path.join(root, "*", "emergency.ckpt.msgpack"))
        mine = self._config_fingerprint()
        def mtime(p):
            # a sibling run may delete its checkpoint between glob and sort;
            # never let that crash the restart loop
            try:
                return os.path.getmtime(p)
            except OSError:
                return 0.0

        for path in sorted(candidates, key=mtime, reverse=True):
            fp = self._read_checkpoint_fingerprint(path)
            if fp == mine:
                yield path
            elif fp is None:
                self.logger.info(
                    f"auto_resume: skipping {path} (no config fingerprint — "
                    "legacy checkpoint; use run.resume_checkpoint to load it)"
                )
            else:
                diff = sorted(
                    k for k in set(mine) | set(fp)
                    if mine.get(k) != fp.get(k)
                )
                self.logger.info(
                    f"auto_resume: skipping {path} (config fingerprint "
                    f"mismatch on {diff})"
                )

    def train(self):
        # failure recovery, stage 2 (SURVEY.md §5 — the reference can only
        # reload weights): restart the same command with run.auto_resume and
        # training continues from the newest full checkpoint (periodic or
        # emergency) with optimizer state, step count and best-mAP tracking
        # intact. Resumed runs are not bit-identical to uninterrupted ones
        # (host RNG shuffle order restarts; an emergency save re-runs its
        # interrupted epoch).
        start_epoch = 0
        resume_from = self.cfg.run.get("resume_checkpoint", None)
        if resume_from:
            start_epoch = self.load_checkpoint(resume_from)
        elif self.cfg.run.get("auto_resume", False):
            # snapshot the pristine init: load_checkpoint mutates
            # self.state/trackers before it can still fail (e.g. an older
            # extra-meta schema raising in _restore_extra_checkpoint_meta);
            # without a rollback the "fresh start" would silently train on
            # the rejected checkpoint's weights
            pristine = (self.state, self.global_step, self.max_mapi2t,
                        self.max_mapt2i, self.best_epoch_i,
                        self.best_epoch_t, self._extra_checkpoint_meta())
            for cand in self._resume_candidates():
                try:
                    start_epoch = self.load_checkpoint(cand)
                    break
                except Exception as e:
                    # unreadable candidate (e.g. truncated by an ungraceful
                    # kill): fall back to the next, or to a fresh start —
                    # never brick the restart loop
                    self.logger.warning(
                        f"auto_resume: {cand} unreadable "
                        f"({type(e).__name__}: {e}) — trying next candidate"
                    )
                    (self.state, self.global_step, self.max_mapi2t,
                     self.max_mapt2i, self.best_epoch_i,
                     self.best_epoch_t, extra) = pristine
                    self._restore_extra_checkpoint_meta(extra)
                    start_epoch = 0
        ckpt_every = int(self.cfg.run.get("checkpoint_every", 0))
        epoch = start_epoch
        # preemption safety: SIGTERM (the pod-reclaim signal) sets a flag;
        # the train loops raise PreemptionRequested at the next SAFE point
        # (between steps/chunks/epochs). A raise straight from the handler
        # could land in the window between a donating jit call returning
        # and the `self.state = …` store, leaving self.state pointing at
        # donated (deleted) buffers that the emergency save cannot
        # serialize. Only the main thread can own signal handlers; tests
        # that drive trainers from worker threads skip the install.
        import signal

        self._preempt_signal = None

        def _on_sigterm(signum, frame):
            self._preempt_signal = signum

        installed = False
        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
            installed = True
        except ValueError:
            prev_handler = None
        try:
            for epoch in range(start_epoch, self.epochs):
                self._check_preempted()
                self.train_epoch(epoch)
                self.valid(epoch, k=self.top_k)
                if ckpt_every and (epoch + 1) % ckpt_every == 0:
                    self.save_checkpoint(
                        os.path.join(self.save_dir, "checkpoint-last.msgpack"),
                        epoch=epoch + 1,
                    )
        except PreemptionRequested:
            path = os.path.join(self.save_dir, "emergency.ckpt.msgpack")
            try:
                self.save_checkpoint(path, epoch=epoch)
            except Exception:
                self.logger.error("preempted (SIGTERM); emergency save "
                                  "failed too")
                return
            self.logger.error(
                f"preempted (SIGTERM) — state saved to {path}; restart the "
                "same command with run.auto_resume to continue"
            )
            return
        except Exception:
            # failure recovery, stage 1: dump the full train state so the
            # run can resume via load_checkpoint / auto_resume
            path = os.path.join(self.save_dir, "emergency.ckpt.msgpack")
            try:
                self.save_checkpoint(path, epoch=epoch)
                self.logger.error(f"training crashed — state saved to {path}")
            except Exception:
                self.logger.error("training crashed; emergency save failed too")
            raise
        finally:
            if installed:
                signal.signal(signal.SIGTERM, prev_handler)
        self.logger.info(
            f">>>>>>> FINISHED >>>>>> Best epoch, I-T: {self.best_epoch_i}, "
            f"mAP: {self.max_mapi2t}, T-I: {self.best_epoch_t}, mAP: {self.max_mapt2i}"
        )

    def _check_preempted(self):
        """Raise PreemptionRequested if SIGTERM arrived — called at safe
        points only (self.state is consistent, no donated buffers live)."""
        if getattr(self, "_preempt_signal", None) is not None:
            sig = self._preempt_signal
            self._preempt_signal = None  # one save per preemption
            raise PreemptionRequested(f"signal {sig}")

    def _stack_host_batches(self, batches):
        """N same-shape loader batches → one stacked host batch with a
        leading steps axis (the eval loader pads ragged tails, so shapes
        always agree)."""
        return {
            k: np.stack([b[k] for b in batches]) for k in batches[0]
        }

    def _train_scan_chunk(self, batches, epoch, all_loss, times):
        """Dispatch ``len(batches)`` train steps as one ``_train_scan``
        call; returns updated (all_loss, times)."""
        n = len(batches)
        stacked = self._put_batch(self._stack_host_batches(batches))
        before = self.global_step
        self.state, (losses, loss_dicts) = self._train_scan(self.state, stacked)
        self.global_step += n
        times += n
        chunk_loss = losses.sum()
        all_loss = chunk_loss if all_loss is None else all_loss + chunk_loss
        if before // self.display_step != self.global_step // self.display_step:
            self.print_loss_dict(
                jax.tree_util.tree_map(lambda x: float(x[-1]), loss_dicts),
                bits=self.output_dim, epoch=epoch, times=times,
            )
        return all_loss, times

    def train_epoch(self, epoch: int):
        self.logger.info(">>>>>> epochs: %d/%d" % (epoch, self.epochs))
        all_loss = None  # device scalar — fetching per step would stall the
        times = 0        # pipeline on a ~40ms host sync each iteration
        t0 = time.time()
        examples = 0
        if self.scan_steps > 1 and not self.profile_dir:
            # chunked device-side stepping: one dispatch per scan_steps
            # steps (proven ≡ per-step in tests/test_train_scan.py)
            buf = []
            full_flushed = False
            for batch in self.train_loader:
                examples += int(batch["valid"].sum())
                buf.append(batch)
                if len(buf) == self.scan_steps:
                    all_loss, times = self._train_scan_chunk(
                        buf, epoch, all_loss, times
                    )
                    full_flushed = True
                    buf = []
                    self._check_preempted()
            if buf and not full_flushed and len(buf) > 1:
                # loader shorter than scan_steps: scan the whole epoch —
                # the same compiled program every epoch
                all_loss, times = self._train_scan_chunk(
                    buf, epoch, all_loss, times
                )
            elif buf:
                # ragged tail after full chunks: reuse the single-step
                # program rather than compiling a bespoke scan at the tail
                # length (a distinct scan length is a distinct XLA program —
                # 10-25 min per cold compile through the tunnel; the ≤
                # scan_steps-1 extra ~40ms dispatches are noise against that)
                for b in buf:
                    self.global_step += 1
                    times += 1
                    self.state, loss, loss_dict = self._train_step(
                        self.state, self._put_batch(b)
                    )
                    all_loss = loss if all_loss is None else all_loss + loss
                    self._check_preempted()
                    if self.global_step % self.display_step == 0:
                        self.print_loss_dict(
                            jax.tree_util.tree_map(float, loss_dict),
                            bits=self.output_dim, epoch=epoch, times=times,
                        )
            epoch_loss = (
                float(all_loss) / max(times, 1) if all_loss is not None else 0.0
            )
            dt = time.time() - t0
            self.logger.info(
                f">>>>>> [{epoch}/{self.epochs}] loss: {epoch_loss}, "
                f"lr: {self._current_lr_str()}, "
                f"throughput: {examples / max(dt, 1e-9):.1f} pairs/s"
            )
            return
        for batch in self.train_loader:
            self.global_step += 1
            times += 1
            if self.profile_dir and self.global_step == 2 and not self._profiling:
                jax.profiler.start_trace(self.profile_dir)
                self._profiling = True
            device_batch = self._put_batch(batch)
            self.state, loss, loss_dict = self._train_step(self.state, device_batch)
            all_loss = loss if all_loss is None else all_loss + loss
            examples += int(batch["valid"].sum())
            self._check_preempted()
            if self._profiling and self.global_step >= 2 + self.profile_steps:
                # force a host VALUE fetch: block_until_ready does not
                # reliably block on the tunneled backend (CLAUDE.md
                # benchmarking trap #1), and a trace stopped early is empty
                float(loss)
                jax.profiler.stop_trace()
                self._profiling = False
                self.logger.info(f"profiler trace written to {self.profile_dir}")
            if self.global_step % self.display_step == 0:
                self.print_loss_dict(
                    jax.tree_util.tree_map(float, loss_dict),
                    bits=self.output_dim, epoch=epoch, times=times,
                )
        if self._profiling:  # epoch shorter than the profile window
            jax.profiler.stop_trace()
            self._profiling = False
            self.logger.info(f"profiler trace written to {self.profile_dir}")
        # the host fetch is the sync point — take it before stopping the clock
        # so throughput measures completed work, not dispatch rate
        epoch_loss = float(all_loss) / max(times, 1) if all_loss is not None else 0.0
        dt = time.time() - t0
        self.logger.info(
            f">>>>>> [{epoch}/{self.epochs}] loss: {epoch_loss}, "
            f"lr: {self._current_lr_str()}, "
            f"throughput: {examples / max(dt, 1e-9):.1f} pairs/s"
        )

    def _current_lr_str(self) -> str:
        factor = float(
            scheduled_lr_factor(
                int(self.state.step), self._t_total,
                self._opt_cfg["schedule"], self._opt_cfg["warmup"],
            )
        )
        lrs = sorted({self._opt_cfg["lr"] * factor, self._opt_cfg["backbone_lr"] * factor})
        return "-".join("%.9f" % x for x in lrs)

    # ------------------------------------------------------------------ eval
    def generate_hash(self, batch):
        """Continuous codes for one eval batch (override point)."""
        return self._encode_step(self.state.params, self.state.model_state, batch)

    def _scatter_codes(self, buffers, hashes, idx, valid):
        """Binarize one eval batch and scatter it into the device-resident
        code buffers — entirely inside jit. The round-1 version fetched
        ``np.asarray(code)`` per loader batch, paying a blocking ~40ms relay
        round-trip each time; accumulating on device defers the single host
        sync to whoever consumes the buffers (mAP kernel / save_mat).

        ``buffers``/``hashes`` are matching pytrees (plain pairs for most
        methods; nested dicts for TwDH's multi-dim codes)."""
        if not hasattr(self, "_scatter_jit"):
            make = self.method.make_hash_code

            def scatter(bufs, hs, idx, valid):
                def upd(buf, h):
                    code = make(h).astype(buf.dtype)
                    safe = jnp.where(valid, idx, buf.shape[0])  # pad → dropped
                    return buf.at[safe].set(code, mode="drop")

                return jax.tree_util.tree_map(upd, bufs, hs)

            self._scatter_jit = jax.jit(scatter, donate_argnums=(0,))
        return self._scatter_jit(
            buffers, hashes, jnp.asarray(idx), jnp.asarray(valid)
        )

    def _run_encode_chunks(self, data_loader, buffers, scan_call, step_call,
                           use_scan: bool):
        """Shared eval-loop chunking: ``scan_steps`` loader batches per
        ``scan_call`` dispatch when ``use_scan``; ragged tails reuse the
        single-step ``step_call`` program (a distinct scan length is a
        distinct XLA program — 10–25 min per cold compile via the tunnel),
        except a loader shorter than one chunk, which scans whole (the same
        compiled program every eval of that loader)."""
        buf = []
        full_flushed = False
        for batch in data_loader:
            if use_scan:
                buf.append(batch)
                if len(buf) == self.scan_steps:
                    buffers = scan_call(buffers, buf)
                    full_flushed = True
                    buf = []
                continue
            buffers = step_call(buffers, batch)
        if buf and not full_flushed and len(buf) > 1:
            buffers = scan_call(buffers, buf)
        elif buf:
            for batch in buf:
                buffers = step_call(buffers, batch)
        return buffers

    def get_code(self, data_loader, length: int):
        k = self.method.eval_code_dims()
        buffers = (
            jnp.zeros((length, k), dtype=jnp.float32),
            jnp.zeros((length, k), dtype=jnp.float32),
        )
        # chunked path: only when the generic encode applies (a subclass
        # overriding generate_hash would be silently bypassed by the scan)
        use_scan = (
            self.scan_steps > 1
            and type(self).generate_hash is BaseTrainer.generate_hash
        )

        def scan_call(bufs, batches):
            return self._encode_scan(
                self.state.params, self.state.model_state, bufs,
                self._put_batch(self._stack_host_batches(batches)),
            )

        def step_call(bufs, batch):
            img_hash, txt_hash = self.generate_hash(self._put_batch(batch))
            return self._scatter_codes(
                bufs, (img_hash, txt_hash), batch["index"], batch["valid"]
            )

        return self._run_encode_chunks(
            data_loader, buffers, scan_call, step_call, use_scan
        )

    def valid(self, epoch: int, k: Optional[int] = None):
        assert self.query_loader is not None and self.retrieval_loader is not None
        save_dir = os.path.join(self.save_dir, "mat_files")
        os.makedirs(save_dir, exist_ok=True)
        self.logger.info("Valid.")
        t0 = time.time()
        query_img, query_txt = self.get_code(self.query_loader, self.query_num)
        retrieval_img, retrieval_txt = self.get_code(
            self.retrieval_loader, self.retrieval_num
        )
        # force a host VALUE fetch before stopping the clock: the encode
        # dispatches are async and block_until_ready is unreliable on the
        # tunneled backend — otherwise encode time bleeds into the mAP split
        for arr in (query_img, query_txt, retrieval_img, retrieval_txt):
            float(arr[-1, 0])
        t_code = time.time() - t0
        t0 = time.time()
        mapi2t, mapt2i, mapi2i, mapt2t = self.calc_map_4dir(
            query_img, query_txt, retrieval_img, retrieval_txt, k
        )
        self.logger.info(
            f"eval timing: code generation {t_code:.2f}s, "
            f"4×mAP {time.time() - t0:.2f}s"
        )
        if self.max_mapi2t < mapi2t:
            self.best_epoch_i = epoch
            self.save_mat(query_img, query_txt, self.query_labels, retrieval_img,
                          retrieval_txt, self.retrieval_labels,
                          save_file=os.path.join(save_dir, "i2t-best.mat"))
            self.save_model_once(self.save_dir, epoch)
        self.max_mapi2t = max(self.max_mapi2t, mapi2t)
        if self.max_mapt2i < mapt2i:
            self.best_epoch_t = epoch
            self.save_mat(query_img, query_txt, self.query_labels, retrieval_img,
                          retrieval_txt, self.retrieval_labels,
                          save_file=os.path.join(save_dir, "t2i-best.mat"))
            self.save_model_once(self.save_dir, epoch)
        self.max_mapt2i = max(self.max_mapt2i, mapt2i)
        self.save_mat(query_img, query_txt, self.query_labels, retrieval_img,
                      retrieval_txt, self.retrieval_labels,
                      save_file=os.path.join(save_dir, "last.mat"))
        self.logger.info(
            f">>>>>> [{epoch}/{self.epochs}], MAP(i->t): {mapi2t}, MAP(t->i): {mapt2i}, "
            f"MAP(t->t): {mapt2t}, MAP(i->i): {mapi2i}, "
            f"MAX MAP(i->t): {self.max_mapi2t}, epoch: {self.best_epoch_i}, "
            f"MAX MAP(t->i): {self.max_mapt2i}, epoch: {self.best_epoch_t}"
        )
        return mapi2t, mapt2i, mapi2i, mapt2t

    def calc_map_4dir(self, query_img, query_txt, retrieval_img, retrieval_txt,
                      k: Optional[int]):
        """Four-direction mAP through the fused dispatcher (shares the
        ground-truth matrix; query-sharded over the device mesh in
        distributed runs, counting-rank Pallas kernel on single-chip TPU
        incl. its f32 wide path for 256–1022-bit codes; argsort fallback
        beyond)."""
        from ..ops.map_bucketed import calc_map_k_4dir_auto

        return calc_map_k_4dir_auto(
            query_img, query_txt, retrieval_img, retrieval_txt,
            self.query_labels, self.retrieval_labels, k, mesh=self.mesh,
        )

    def test(self):
        assert self.model_state != "", "test step must provide the model file!"
        self.logger.info("Test.")
        save_dir = os.path.join(self.save_dir, "mat_files")
        os.makedirs(save_dir, exist_ok=True)
        query_img, query_txt = self.get_code(self.query_loader, self.query_num)
        retrieval_img, retrieval_txt = self.get_code(
            self.retrieval_loader, self.retrieval_num
        )
        mapi2t, mapt2i, mapi2i, mapt2t = self.calc_map_4dir(
            query_img, query_txt, retrieval_img, retrieval_txt, self.top_k
        )
        self.save_mat(query_img, query_txt, self.query_labels, retrieval_img,
                      retrieval_txt, self.retrieval_labels,
                      save_file=os.path.join(save_dir, "test.mat"))
        self.logger.info(
            f">>>>>> TEST, MAP(i->t): {mapi2t}, MAP(t->i): {mapt2i}, "
            f"MAP(t->t): {mapt2t}, MAP(i->i): {mapi2i}"
        )
        return mapi2t, mapt2i, mapi2i, mapt2t

    # ------------------------------------------------------------- artifacts
    @classmethod
    def save_mat(cls, query_img, query_txt, query_labels, retrieval_img,
                 retrieval_txt, retrieval_labels, save_file="i2t"):
        import scipy.io as scio

        result_dict = {
            "q_img": np.asarray(query_img),
            "q_txt": np.asarray(query_txt),
            "r_img": np.asarray(retrieval_img),
            "r_txt": np.asarray(retrieval_txt),
            "q_l": np.asarray(query_labels),
            "r_l": np.asarray(retrieval_labels),
        }
        scio.savemat(save_file, result_dict)

    def save_model_once(self, save_dir, epoch, other=""):
        """``save_model`` that skips a second identical write in the same
        epoch. The reference saves on each new-best direction independently
        (runners/base.py:326,332) — when both i→t and t→i improve in one
        epoch it writes the same state_dict twice; at full scale one write
        is ~13s of serialization, so the duplicate is pure waste. The
        resulting artifact set is byte-identical either way."""
        key = (save_dir, epoch, other)
        if getattr(self, "_last_model_save", None) == key:
            return
        self._last_model_save = key
        self.save_model(save_dir, epoch, other)

    def save_model(self, save_dir, epoch, other=""):
        """Weights-only snapshot (reference save_model parity,
        runners/base.py:379-384); full checkpoints incl. optimizer state go
        through ``save_checkpoint``."""
        import flax.serialization

        path = os.path.join(save_dir, "model-" + other + str(epoch) + ".msgpack")
        blob = flax.serialization.to_bytes(
            {"params": self.state.params, "model_state": self.state.model_state}
        )
        with open(path, "wb") as f:
            f.write(blob)
        self.logger.info("save mode to {}".format(path))

    @staticmethod
    def load_model_file(path, params_template, model_state_template):
        import flax.serialization

        with open(path, "rb") as f:
            blob = f.read()
        restored = flax.serialization.from_bytes(
            {"params": params_template, "model_state": model_state_template}, blob
        )
        return restored["params"], restored["model_state"]

    def _checkpoint_meta(self, epoch: int) -> dict:
        """Trainer bookkeeping alongside the train state: ``epoch`` is the
        next epoch to run on resume."""
        return {
            "epoch": int(epoch),
            "global_step": int(self.global_step),
            "max_mapi2t": float(self.max_mapi2t),
            "max_mapt2i": float(self.max_mapt2i),
            "best_epoch_i": int(self.best_epoch_i),
            "best_epoch_t": int(self.best_epoch_t),
            "fingerprint": self._config_fingerprint(),
            "extra": self._extra_checkpoint_meta(),
        }

    def _extra_checkpoint_meta(self) -> dict:
        """Hook for runner-specific best-tracking (TwDH short dims, UMoED
        i2i/t2t) so auto-resume carries it; msgpack-serializable scalars
        only."""
        return {}

    def _restore_extra_checkpoint_meta(self, extra: dict) -> None:
        pass

    def save_checkpoint(self, path: str, epoch: int = 0):
        """Full train-state checkpoint (params + optimizer + step + trainer
        bookkeeping) — the resume capability the reference lacks
        (runners/base.py:380-382)."""
        import flax.serialization

        meta = self._checkpoint_meta(epoch)
        blob = {"state": self.state._asdict(), "meta": meta}
        # atomic replace: a kill (SIGKILL after the SIGTERM grace period,
        # disk-full, power loss) mid-write must never leave a truncated
        # msgpack under a valid sidecar — that would brick auto_resume
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(flax.serialization.to_bytes(blob))
        os.replace(tmp, path)
        # JSON sidecar: lets auto-resume check run identity without parsing
        # the (possibly multi-GB) msgpack state blob
        import json

        tmp = path + ".meta.json.tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"epoch": meta["epoch"], "fingerprint": meta["fingerprint"]},
                f, indent=1,
            )
        os.replace(tmp, path + ".meta.json")
        self.logger.info(f"checkpoint saved to {path}")

    def load_checkpoint(self, path: str) -> int:
        """Restore a full checkpoint; returns the next epoch to run (0 for
        legacy meta-less checkpoints)."""
        import flax.serialization as ser

        with open(path, "rb") as f:
            raw = f.read()
        raw_tree = ser.msgpack_restore(raw)
        meta = None
        if set(raw_tree) == {"state", "meta"}:
            meta = raw_tree["meta"]
            raw_tree = raw_tree["state"]
        try:
            restored = {
                f: ser.from_state_dict(t, raw_tree[f])
                for f, t in self.state._asdict().items()
            }
        except Exception:
            # optimizer-format mismatch: off-mesh runs store the flat
            # BertAdam state, mesh runs the tree state — convert per
            # partition so checkpoints move freely between the two
            from ..optim.bert_adam import convert_bert_adam_state

            try:
                restored = {}
                for field, tmpl in self.state._asdict().items():
                    sub = raw_tree[field]
                    if field == "opt_state":
                        restored[field] = {
                            k: convert_bert_adam_state(
                                sub[k], tmpl[k], self.state.params[k])
                            for k in tmpl
                        }
                    else:
                        restored[field] = ser.from_state_dict(tmpl, sub)
            except Exception as e:
                raise ValueError(
                    f"checkpoint at {path} does not match this trainer's "
                    f"state structure (different method/model config?): "
                    f"{type(e).__name__}: {e}"
                ) from e
            self.logger.info(
                "optimizer state format converted (flat↔tree) on restore")
        self.state = TrainState(**restored)
        start_epoch = 0
        if meta is not None and meta.get("fingerprint") is not None:
            fp, mine = meta["fingerprint"], self._config_fingerprint()
            if fp != mine:
                # explicit resume_checkpoint: honor the user's choice, but
                # name the divergence (auto_resume never reaches here with a
                # mismatch — _find_resume_checkpoint filters)
                diff = sorted(
                    k for k in set(mine) | set(fp) if mine.get(k) != fp.get(k)
                )
                self.logger.warning(
                    f"checkpoint config fingerprint differs from this run on "
                    f"{diff} — resuming anyway (explicitly requested)"
                )
        if meta is not None:
            self.global_step = int(meta["global_step"])
            self.max_mapi2t = float(meta["max_mapi2t"])
            self.max_mapt2i = float(meta["max_mapt2i"])
            self.best_epoch_i = int(meta["best_epoch_i"])
            self.best_epoch_t = int(meta["best_epoch_t"])
            self._restore_extra_checkpoint_meta(meta.get("extra") or {})
            start_epoch = int(meta["epoch"])
        self.logger.info(
            f"checkpoint restored from {path} (resuming at epoch "
            f"{start_epoch})")
        return start_epoch

    def save_checkpoint_orbax(self, directory: str):
        """Orbax checkpoint of the full train state — sharding-aware and the
        right choice for multi-host runs (msgpack gathers to host 0)."""
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(
                os.path.abspath(directory), self.state._asdict(), force=True
            )
        self.logger.info(f"orbax checkpoint saved to {directory}")

    def load_checkpoint_orbax(self, directory: str):
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(
                os.path.abspath(directory),
                item=jax.tree_util.tree_map(np.asarray, self.state._asdict()),
            )
        self.state = TrainState(
            **jax.tree_util.tree_map(jnp.asarray, restored)
        )
        self.logger.info(f"orbax checkpoint restored from {directory}")

    # --------------------------------------------------------------- logging
    def print_loss_dict(self, loss_dict, bits=16, epoch=0, times=0):
        print_str = (
            f">>>>>> Display ({self.loss_type} loss-{bits}) >>>>>> "
            f"[{epoch}/{self.epochs}], [{times}/{len(self.train_loader)}]: "
        )

        def leaf_str(d, key, acc):
            acc += f"{key}: "
            if isinstance(d[key], dict):
                for kk in d[key]:
                    acc = leaf_str(d[key], kk, acc)
            else:
                acc += f"{d[key]}, "
            return acc

        for key in loss_dict.keys():
            print_str += leaf_str(loss_dict, key, "")
        print_str += f"lr: {self._current_lr_str()}"
        self.logger.info(print_str)

    # ------------------------------------------------------------ config API
    @classmethod
    def from_config(cls, rank=0, world_size=1, distributed=False, cfg=None,
                    logger=None, auto_run=True):
        assert cfg is not None, "config is None!"
        run = cfg.run
        return cls(
            cfg,
            is_train=run.get("is_train", True),
            logger=logger,
            device=rank if distributed else run.get("device", 0),
            output_dim=run.get("output_dim", 16),
            train_num=run.get("train_num", 10000),
            query_num=run.get("query_num", 5000),
            epochs=run.get("epochs", 10),
            save_dir=run.get("save_dir", "./result"),
            batch_size=run.get("batch_size", 128),
            display_step=run.get("display_step", 20),
            top_k=run.get("top_k", None),
            model_state=run.get("resume_model", ""),
            world_size=world_size,
            distributed=distributed,
            auto_run=auto_run,
        )
