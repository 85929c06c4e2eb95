"""Tensor-parallel sharding rules for the CLIP backbone.

The reference has no tensor parallelism (SURVEY.md §2.8); this provides the
TPU-native hook: a rule-based `PartitionSpec` tree over the param pytree.
Megatron-style layout — attention QKV and the MLP up-projection split their
output features over the ``tp`` axis, the attention output projection and
MLP down-projection split their input features, everything else (LayerNorms,
embeddings, heads) stays replicated. With the batch sharded over ``dp`` and
these param shardings handed to jit, XLA places the matching all-reduces on
ICI automatically — no manual collectives.

ViT-B/32 fits comfortably on one v5e chip, so tp is off (tp=1) by default;
the rules exist so larger towers (ViT-L/H) shard without code changes.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import TP_AXIS

# (path-suffix, spec) — first match wins. Kernels are (in, out). The
# attention module name varies ("attn" in CLIP towers, "self_attn"/
# "cross_attn" in UMoED's decoder) — suffix elements ending in "*" match
# any path component with that trailing text, so every MultiHeadAttention
# shards regardless of its instance name.
#
# Known layout caveat: the packed (d, 3d) in_proj kernel splits the QKV
# axis CONTIGUOUSLY over tp, so the q/k/v boundaries (at d and 2d) cross
# shards and GSPMD inserts reshardings around the per-head split — exact
# (tested vs unsharded) but not the head-aligned Megatron layout; a clean
# fix needs a (d, 3, d)-shaped param, i.e. a model/checkpoint change.
# Revisit if tp>1 ever runs on real multi-chip hardware.
_TP_RULES = (
    (("*attn", "in_proj_kernel"), P(None, TP_AXIS)),  # QKV columns
    (("*attn", "in_proj_bias"), P(TP_AXIS)),
    (("*attn", "out_proj_kernel"), P(TP_AXIS, None)),  # rows (contracted)
    (("c_fc", "kernel"), P(None, TP_AXIS)),           # MLP up
    (("c_fc", "bias"), P(TP_AXIS)),
    (("c_proj", "kernel"), P(TP_AXIS, None)),         # MLP down
    # Expert parallelism for UMoED's Soft-MoE (models/umoed.py:SoftMoE):
    # the expert axis shards over tp — dispatch/expert einsums run per
    # shard, XLA psums the combine contraction over experts. The reference
    # runs all experts on one device (SURVEY.md §2.8, SoftMoe.py:187-204).
    (("phi",), P(None, TP_AXIS, None)),               # (d, n_exp, p)
    (("expert_kernel",), P(TP_AXIS, None, None)),     # (n_exp, d, e)
    (("expert_bias",), P(TP_AXIS, None)),             # (n_exp, e)
)


def _match(name: str, pat: str) -> bool:
    return name.endswith(pat[1:]) if pat.startswith("*") else name == pat


def _spec_for_path(path) -> P:
    names = tuple(
        p.key if hasattr(p, "key") else str(p) for p in path
    )
    for suffix, spec in _TP_RULES:
        if len(names) >= len(suffix) and all(
            _match(n, p) for n, p in zip(names[-len(suffix):], suffix)
        ):
            return spec
    return P()


def tp_param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree for the params: TP rules + replication elsewhere."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_path(path)), params
    )


def state_shardings(state, mesh: Mesh):
    """Shardings for a full TrainState: params (and their optimizer moments)
    follow the TP rules; everything else replicates."""
    rep = NamedSharding(mesh, P())
    param_sh = tp_param_shardings(state.params, mesh)

    return type(state)(
        params=param_sh,
        model_state=jax.tree_util.tree_map(lambda _: rep, state.model_state),
        # BertAdam moments mirror the param tree inside each partition entry,
        # so the same path-based rules apply leaf-for-leaf
        opt_state=tp_param_shardings(state.opt_state, mesh),
        method_state=jax.tree_util.tree_map(lambda _: rep, state.method_state),
        step=rep,
    )
