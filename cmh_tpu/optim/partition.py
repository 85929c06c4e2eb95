"""Per-submodule optimizer partitioning.

The reference builds two param groups (backbone lr vs hash lr,
/root/reference/runners/base.py:120-142) and some methods add a second SGD
optimizer for proxy parameters (runners/DSPH/runner.py:83-91). Here the param
tree's *top-level keys* (``backbone``, ``hash``, ``proxy``, …) partition the
optimizer: each key gets its own optax transform, and the whole thing is one
pure update over pytrees that fuses into the jitted train step.
"""

from __future__ import annotations

from typing import Any, Dict

import optax


def partitioned_optimizer(
    transforms: Dict[str, optax.GradientTransformation],
    default: optax.GradientTransformation,
) -> optax.GradientTransformation:
    """Route each top-level params subtree to its own transform."""

    def tx_for(key: str) -> optax.GradientTransformation:
        return transforms.get(key, default)

    def init_fn(params: Dict[str, Any]):
        return {k: tx_for(k).init(v) for k, v in params.items()}

    def update_fn(grads, state, params=None):
        assert params is not None
        updates, new_state = {}, {}
        for k, g in grads.items():
            u, s = tx_for(k).update(g, state[k], params[k])
            updates[k] = u
            new_state[k] = s
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)
