"""BertAdam as an optax GradientTransformation.

Faithful re-implementation of the reference optimizer semantics
(/root/reference/models/common/optimizer.py:102-166) in functional JAX form:

- **per-parameter** gradient-norm clipping inside the step (each leaf tensor
  clipped to ``max_grad_norm`` independently — NOT global clipping),
- Adam moments **without** bias correction,
- decoupled weight decay added to the update (not the gradient),
- internal LR schedule (warmup_cosine / warmup_constant / warmup_linear)
  keyed on ``step / t_total``; the first update uses schedule(0),
- per-leaf base learning rates (the reference uses two param groups:
  backbone lr vs hash-head lr — runners/base.py:120-142) via an ``lr_map``
  pytree of the same structure as the params.

The whole step is a pure function over pytrees, so the entire optimizer
fuses into the jitted train step on TPU (the reference runs a python loop
over parameters on the host every step).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..registry import registry


def warmup_cosine(x, warmup=0.002):
    return jnp.where(x < warmup, x / warmup, 0.5 * (1.0 + jnp.cos(math.pi * x)))


def warmup_constant(x, warmup=0.002):
    return jnp.where(x < warmup, x / warmup, 1.0)


def warmup_linear(x, warmup=0.002):
    return jnp.where(x < warmup, x / warmup, jnp.maximum((x - 1.0) / (warmup - 1.0), 0.0))


SCHEDULES = {
    "warmup_cosine": warmup_cosine,
    "warmup_constant": warmup_constant,
    "warmup_linear": warmup_linear,
}


class BertAdamState(NamedTuple):
    step: jax.Array       # int32 scalar
    m: Any                # first-moment pytree
    v: Any                # second-moment pytree


class FlatBertAdamState(NamedTuple):
    """State of the flattened fast path (``bert_adam(..., flat=True)``).

    ``m``/``v`` hold every leaf's moments concatenated into one fp32 vector
    (each leaf zero-padded to a multiple of ``_CHUNK``); ``chunk_leaf`` maps
    each chunk to its leaf index so the per-leaf clip norms come out of one
    segment reduction instead of one reduce per parameter tensor."""

    step: jax.Array        # int32 scalar
    m: jax.Array           # (T,) fp32
    v: jax.Array           # (T,) fp32
    chunk_leaf: jax.Array  # (T // _CHUNK,) int32


_CHUNK = 512


class _FlatSpec:
    """Static layout of a params pytree inside the flat vector."""

    def __init__(self, params):
        leaves, self.treedef = jax.tree_util.tree_flatten(params)
        self.shapes = [l.shape for l in leaves]
        self.dtypes = [l.dtype for l in leaves]
        # math.prod(()) == 1 covers scalars; zero-size leaves flatten to
        # zero padded chunks and round-trip naturally
        self.sizes = [math.prod(l.shape) for l in leaves]
        self.padded = [-(-s // _CHUNK) * _CHUNK for s in self.sizes]
        self.offsets = [0]
        for p in self.padded:
            self.offsets.append(self.offsets[-1] + p)
        self.total = self.offsets[-1]
        self.n_leaves = len(leaves)

    def chunk_leaf(self):
        import numpy as np

        return jnp.asarray(
            np.repeat(np.arange(self.n_leaves, dtype=np.int32),
                      [p // _CHUNK for p in self.padded])
        )

    def flatten(self, tree):
        """Concatenate the tree's leaves (fp32, zero-padded) — one HLO op."""
        leaves = jax.tree_util.tree_leaves(tree)
        zpad = jnp.zeros((_CHUNK,), jnp.float32)
        pieces = []
        for leaf, size, padded in zip(leaves, self.sizes, self.padded):
            pieces.append(leaf.astype(jnp.float32).reshape(size))
            if padded != size:
                pieces.append(zpad[: padded - size])
        return jnp.concatenate(pieces) if pieces else jnp.zeros((0,), jnp.float32)

    def unflatten(self, flat):
        leaves = [
            flat[o:o + s].reshape(shape).astype(dt)
            for o, s, shape, dt in zip(self.offsets, self.sizes, self.shapes,
                                       self.dtypes)
        ]
        return jax.tree_util.tree_unflatten(self.treedef, leaves)


def scheduled_lr_factor(
    step, t_total: int, schedule: str = "warmup_linear", warmup: float = -1.0
):
    """The multiplicative schedule factor at ``step`` (python or traced)."""
    if t_total == -1:
        return jnp.asarray(1.0, jnp.float32)
    progress = jnp.asarray(step, jnp.float32) / t_total
    # warmup=-1 passes through RAW, exactly like the reference (its schedule
    # fns then never take the ramp branch: x < -1 is false for x >= 0) —
    # rewriting it to 0.002 here would double the mid-run lr vs the
    # reference for direct bert_adam(t_total=...) callers
    return SCHEDULES[schedule](progress, warmup)


def bert_adam(
    lr: float,
    lr_map: Optional[Any] = None,
    warmup: float = -1.0,
    t_total: int = -1,
    schedule: str = "warmup_linear",
    b1: float = 0.9,
    b2: float = 0.999,
    e: float = 1e-6,
    weight_decay: float = 0.01,
    max_grad_norm: float = 1.0,
    flat: bool = False,
) -> optax.GradientTransformation:
    """Build the BertAdam transform.

    Args:
      lr: default base learning rate.
      lr_map: optional pytree matching the params whose leaves are per-leaf
        base learning rates (overrides ``lr`` where present).
      Other args mirror the reference constructor defaults
      (optimizer.py:65-67).
      flat: use the flattened fast path — same math, but the ~6 ops ×
        ~400 leaves the tree path emits (measured ~25 ms/step of the
        103 ms ViT-B/32 train step on v5e) collapse into a handful of
        whole-vector ops + one segment reduction for the per-leaf clip
        norms. Requires a uniform ``lr`` (no ``lr_map``) and is
        incompatible with the TP optimizer-state shardings — the trainer
        enables it only off-mesh.
    """
    if schedule not in SCHEDULES:
        raise ValueError(f"Invalid schedule parameter: {schedule}")
    if flat:
        if lr_map is not None:
            raise ValueError(
                "flat=True requires a uniform lr — per-leaf lr_map would "
                "silently fall back to the slow tree path (and a different "
                "checkpoint state format); drop flat or lr_map"
            )
        return _bert_adam_flat(lr, warmup, t_total, schedule, b1, b2, e,
                               weight_decay, max_grad_norm)

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return BertAdamState(step=jnp.zeros((), jnp.int32), m=zeros,
                             v=jax.tree_util.tree_map(jnp.zeros_like, params))

    def _clip(g):
        if max_grad_norm <= 0:
            return g
        # torch clip_grad_norm_: coef = max_norm / (norm + 1e-6), applied
        # only when it is < 1 (torch/nn/utils/clip_grad.py semantics)
        norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
        coef = jnp.minimum(max_grad_norm / (norm + 1e-6), 1.0)
        return (g.astype(jnp.float32) * coef).astype(g.dtype)

    def update_fn(grads, state, params=None):
        assert params is not None, "bert_adam requires params for weight decay"
        grads = jax.tree_util.tree_map(_clip, grads)
        new_m = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.m, grads
        )
        new_v = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * g * g, state.v, grads
        )
        factor = scheduled_lr_factor(state.step, t_total, schedule, warmup)

        if lr_map is not None:
            lr_leaves = lr_map
        else:
            lr_leaves = jax.tree_util.tree_map(lambda _: lr, params)

        def leaf_update(m, v, p, base_lr):
            upd = m / (jnp.sqrt(v) + e)
            if weight_decay > 0.0:
                upd = upd + weight_decay * p
            return -(base_lr * factor) * upd

        updates = jax.tree_util.tree_map(leaf_update, new_m, new_v, params, lr_leaves)
        return updates, BertAdamState(step=state.step + 1, m=new_m, v=new_v)

    return optax.GradientTransformation(init_fn, update_fn)


def _bert_adam_flat(lr, warmup, t_total, schedule, b1, b2, e, weight_decay,
                    max_grad_norm) -> optax.GradientTransformation:
    """Flattened BertAdam: identical math to the tree path, one vector.

    Per-leaf clip (torch clip_grad_norm_ semantics, reference
    optimizer.py:120-125) is computed as chunk partial sums → one
    ``segment_sum`` over chunk→leaf ids → per-leaf coefficients gathered
    back per chunk. Summation order per leaf differs from the tree path
    only in reduction association (chunked vs whole-leaf), both fp32."""

    def init_fn(params):
        spec = _FlatSpec(params)
        # m and v must be distinct buffers: the jitted train step donates
        # the state, and aliasing one zeros array twice trips XLA's
        # "donate the same buffer twice" check at Execute()
        return FlatBertAdamState(step=jnp.zeros((), jnp.int32),
                                 m=jnp.zeros((spec.total,), jnp.float32),
                                 v=jnp.zeros((spec.total,), jnp.float32),
                                 chunk_leaf=spec.chunk_leaf())

    def update_fn(grads, state, params=None):
        assert params is not None, "bert_adam requires params for weight decay"
        spec = _FlatSpec(params)
        g = spec.flatten(grads)
        if spec.n_leaves and max_grad_norm > 0:
            gc = g.reshape(-1, _CHUNK)
            chunk_ss = jnp.sum(gc * gc, axis=1)
            leaf_ss = jax.ops.segment_sum(
                chunk_ss, state.chunk_leaf, num_segments=spec.n_leaves,
                indices_are_sorted=True,
            )
            coef = jnp.minimum(max_grad_norm / (jnp.sqrt(leaf_ss) + 1e-6), 1.0)
            g = (gc * coef[state.chunk_leaf][:, None]).reshape(-1)
        new_m = b1 * state.m + (1.0 - b1) * g
        new_v = b2 * state.v + (1.0 - b2) * g * g
        factor = scheduled_lr_factor(state.step, t_total, schedule, warmup)
        upd = new_m / (jnp.sqrt(new_v) + e)
        if weight_decay > 0.0:
            upd = upd + weight_decay * spec.flatten(params)
        upd = -(lr * factor) * upd
        updates = spec.unflatten(upd)
        return updates, FlatBertAdamState(step=state.step + 1, m=new_m,
                                          v=new_v, chunk_leaf=state.chunk_leaf)

    return optax.GradientTransformation(init_fn, update_fn)


def convert_bert_adam_state(raw_state_dict, template, params):
    """Restore a serialized BertAdam state into ``template``'s format.

    A checkpoint written off-mesh carries the flat state (single m/v
    vectors) while a mesh run builds the tree state, and vice versa —
    this converts either serialized form (flax ``to_state_dict`` layout,
    e.g. out of ``msgpack_restore``) into whatever the live optimizer
    expects, so runs can move between single-chip and mesh freely.
    Non-BertAdam states (SGD proxies, …) restore against the template
    unchanged."""
    import flax.serialization as ser

    is_flat_raw = (
        isinstance(raw_state_dict, dict)
        and set(raw_state_dict) >= {"step", "m", "v"}
        and not isinstance(raw_state_dict["m"], dict)
    )
    is_tree_raw = (
        isinstance(raw_state_dict, dict)
        and set(raw_state_dict) >= {"step", "m", "v"}
        and isinstance(raw_state_dict["m"], dict)
    )
    if isinstance(template, FlatBertAdamState) and is_tree_raw:
        spec = _FlatSpec(params)
        f32 = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params)
        m = spec.flatten(ser.from_state_dict(f32, raw_state_dict["m"]))
        v = spec.flatten(ser.from_state_dict(f32, raw_state_dict["v"]))
        return FlatBertAdamState(
            step=jnp.asarray(raw_state_dict["step"], jnp.int32), m=m, v=v,
            chunk_leaf=spec.chunk_leaf())
    if isinstance(template, BertAdamState) and is_flat_raw:
        spec = _FlatSpec(params)
        m = spec.unflatten(jnp.asarray(raw_state_dict["m"], jnp.float32))
        v = spec.unflatten(jnp.asarray(raw_state_dict["v"], jnp.float32))
        return BertAdamState(
            step=jnp.asarray(raw_state_dict["step"], jnp.int32), m=m, v=v)
    return ser.from_state_dict(template, raw_state_dict)


def build_lr_map(params: Any, base_lr: float, overrides: dict) -> Any:
    """Per-leaf lr pytree: top-level keys in ``overrides`` get their own lr.

    Mirrors the reference's two param groups (backbone lr vs hash lr,
    runners/base.py:136-137): ``overrides={'backbone': 1e-5}`` assigns 1e-5
    to every leaf under params['backbone'] and ``base_lr`` elsewhere.
    """
    out = {}
    for key, sub in params.items():
        sub_lr = overrides.get(key, base_lr)
        out[key] = jax.tree_util.tree_map(lambda _: sub_lr, sub)
    return out


@registry.register_optimizer("BertAdam")
class BertAdamFactory:
    """Registry adapter: cfg → optax transform (arch name parity)."""

    @staticmethod
    def from_config(cfg_optimizer, lr_map=None, t_total: int = -1,
                    flat: bool = False):
        return bert_adam(
            lr=cfg_optimizer.get("lr", 0.001),
            lr_map=lr_map,
            flat=flat,
            warmup=cfg_optimizer.get("warmup_proportion", 0.1),
            t_total=t_total,
            schedule=cfg_optimizer.get("schedule", "warmup_cosine"),
            b1=cfg_optimizer.get("b1", 0.9),
            b2=cfg_optimizer.get("b2", 0.98),
            e=cfg_optimizer.get("e", 1e-6),
            weight_decay=cfg_optimizer.get("weight_decay", 0.2),
            max_grad_norm=cfg_optimizer.get("max_grad_norm", 1.0),
        )


@registry.register_optimizer("SGD")
class SGDFactory:
    """torch.optim.SGD(momentum) equivalent — used for proxy parameters by
    DSPH/DNPH (reference runners/DSPH/runner.py:83-91)."""

    @staticmethod
    def from_config(cfg, lr: float = 0.01, momentum: float = 0.9):
        return optax.sgd(learning_rate=lr, momentum=momentum)
