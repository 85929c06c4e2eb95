"""Import reference-framework (torch) method checkpoints into cmh_tpu.

The reference saves ``model.state_dict()`` of the whole method — CLIP
backbone plus the method's hash head (/root/reference/runners/base.py:379-384).
This module converts such state into our flax param/collection trees so a
model trained under the torch reference can be evaluated or fine-tuned here,
and so the end-to-end parity harness can start both frameworks from
bit-identical weights.

Currently covers DCMHT (backbone + two ModalityHash heads,
/root/reference/models/DCMHT/hash/hash.py:15-82); the building-block
converters (`_attention`, `_linear`, `_layernorm`, `_batchnorm`) apply to the
other methods' heads as they gain importers.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from .clip.loader import infer_config, params_from_state_dict


def _np(v) -> np.ndarray:
    return np.asarray(
        v.detach().cpu().numpy() if hasattr(v, "detach") else v, dtype=np.float32
    )


def _linear(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch nn.Linear (out,in) weight → flax Dense (in,out) kernel."""
    return {"kernel": _np(sd[prefix + ".weight"]).T,
            "bias": _np(sd[prefix + ".bias"])}


def _layernorm(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[prefix + ".weight"]),
            "bias": _np(sd[prefix + ".bias"])}


def _attention(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch nn.MultiheadAttention packed projections → SingleTokenAttention
    layout (models/common.py): kernels transposed to (in, out)."""
    return {
        "in_proj_kernel": _np(sd[prefix + ".in_proj_weight"]).T,
        "in_proj_bias": _np(sd[prefix + ".in_proj_bias"]),
        "out_proj_kernel": _np(sd[prefix + ".out_proj.weight"]).T,
        "out_proj_bias": _np(sd[prefix + ".out_proj.bias"]),
    }


def _batchnorm(sd: Dict[str, Any], prefix: str):
    """torch BatchNorm1d → (params, batch_stats) for our BatchNorm1d."""
    params = {"scale": _np(sd[prefix + ".weight"]),
              "bias": _np(sd[prefix + ".bias"])}
    stats = {"mean": _np(sd[prefix + ".running_mean"]),
             "var": _np(sd[prefix + ".running_var"])}
    return params, stats


def _modality_hash(sd: Dict[str, Any], prefix: str, layernorm: bool):
    """Reference ModalityHash (atten → norm → fc2) → our param subtree.

    Returns (params, batch_stats_or_None)."""
    params = {
        "atten": _attention(sd, prefix + ".atten"),
        "fc2": _linear(sd, prefix + ".fc2"),
    }
    stats = None
    if layernorm:
        params["norm"] = _layernorm(sd, prefix + ".norm")
    else:
        bn_params, bn_stats = _batchnorm(sd, prefix + ".norm")
        params["norm"] = {"bn": bn_params}
        stats = {"norm": {"bn": bn_stats}}
    return params, stats


def dcmht_from_torch_state(
    state_dict: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Full reference DCMHT state_dict → (params, model_state).

    ``params`` has the {backbone, hash_img, hash_txt} top-level layout the
    optimizer partitioning expects; ``model_state`` carries the image head's
    BatchNorm running stats in the ``batch_stats`` collection.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    backbone_sd = {
        k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")
    }
    clip_cfg = infer_config(backbone_sd)
    img_params, img_stats = _modality_hash(sd, "hash.img_hash", layernorm=False)
    txt_params, _ = _modality_hash(sd, "hash.txt_hash", layernorm=True)
    params = {
        "backbone": params_from_state_dict(backbone_sd, clip_cfg),
        "hash_img": img_params,
        "hash_txt": txt_params,
    }
    model_state = {"batch_stats": {"hash_img": img_stats}}
    return params, model_state
