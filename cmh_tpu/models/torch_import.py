"""Import reference-framework (torch) method checkpoints into cmh_tpu.

The reference saves ``model.state_dict()`` of the whole method — CLIP
backbone plus the method's hash head (/root/reference/runners/base.py:379-384).
This module converts such state into our flax param/collection trees so a
model trained under the torch reference can be evaluated or fine-tuned here,
and so the end-to-end parity harness can start both frameworks from
bit-identical weights.

Covers all eight methods (DCMHT, MITH, DSPH, DNPH, TwDH, DIMCH, UMoED,
Baseline) via per-method head converters built on the shared building
blocks (`_attention`, `_linear`, `_layernorm`, `_batchnorm`).
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


def dsph_from_torch_state(
    state_dict: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference DSPH state_dict → (params, model_state).

    Layout: backbone + two LinearHash heads (models/DSPH/hash/hash.py:6-26,
    dropout carries no params) + the HyP class proxies
    (models/DSPH/loss/HyP.py:15)."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    backbone_sd = {
        k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")
    }
    params = {
        "backbone": params_from_state_dict(backbone_sd, infer_config(backbone_sd)),
        "hash_img": {"fc": _linear(sd, "hash.img_hash.fc")},
        "hash_txt": {"fc": _linear(sd, "hash.txt_hash.fc")},
        "proxies": sd["hyp.proxies"],
    }
    return params, {}


def dnph_from_torch_state(
    state_dict: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference DNPH state_dict → (params, model_state).

    Layout: backbone + LinearHash + Pre_Layer per modality
    (models/DNPH/hash/hash.py:9-45) + the proxy-loss proxies
    (models/DNPH/loss/loss.py:8)."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    backbone_sd = {
        k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")
    }
    params = {
        "backbone": params_from_state_dict(backbone_sd, infer_config(backbone_sd)),
        "hash_img": {"fc": _linear(sd, "hash.image_hash.fc")},
        "hash_txt": {"fc": _linear(sd, "hash.text_hash.fc")},
        "pre_img": _linear(sd, "hash.image_pre.fc"),
        "pre_txt": _linear(sd, "hash.text_pre.fc"),
        "proxies": sd["loss.proxies"],
    }
    return params, {}


def _clip_block(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """Reference CLIP ResidualAttentionBlock → our block subtree (same
    layout the backbone loader uses, models/clip/loader.py:_block)."""
    return {
        "attn": _attention(sd, prefix + ".attn"),
        "ln_1": {"ln": _layernorm(sd, prefix + ".ln_1")},
        "ln_2": {"ln": _layernorm(sd, prefix + ".ln_2")},
        "c_fc": _linear(sd, prefix + ".mlp.c_fc"),
        "c_proj": _linear(sd, prefix + ".mlp.c_proj"),
    }


def _mith_lct(sd: Dict[str, Any], prefix: str, k_bits: int,
              layers: int) -> Dict[str, Any]:
    """Reference LocalConceptTransforming → our lct subtree: 2-layer CLIP
    transformer + BitwiseHashing (k separate Linear(d,1) rows stacked into
    one (k_bits, d) kernel) — models/MITH/hash/hash.py:68-191."""
    hashing_kernel = np.stack(
        [_np(sd[f"{prefix}.hashing.fc_list.{k}.weight"])[0] for k in range(k_bits)]
    )
    hashing_bias = np.stack(
        [_np(sd[f"{prefix}.hashing.fc_list.{k}.bias"])[0] for k in range(k_bits)]
    )
    return {
        "transformer": {
            f"resblocks_{j}": _clip_block(sd, f"{prefix}.transformer.resblocks.{j}")
            for j in range(layers)
        },
        "hashing": {"kernel": hashing_kernel, "bias": hashing_bias},
    }


def mith_from_torch_state(
    state_dict: Dict[str, Any], k_bits: int, transformer_layers: int = 2,
    res_mlp_layers: int = 2,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference MITH state_dict → (params, model_state).

    The reference shares one GlobalConceptLearning between modalities
    (``gcl_i = gcl_t``, models/MITH/hash/hash.py:218) — both state_dict
    aliases hold identical tensors; we read ``gcl_i``. The sin-cos
    positional encoding is a deterministic buffer (recomputed on our side).
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    backbone_sd = {
        k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")
    }
    gcl_mlp = {}
    for i in range(res_mlp_layers):
        gcl_mlp[f"fc1_{i}"] = _linear(sd, f"hash.gcl_i.mlp.mlps.{i}.0")
        gcl_mlp[f"fc2_{i}"] = _linear(sd, f"hash.gcl_i.mlp.mlps.{i}.3")
        gcl_mlp[f"ln_{i}"] = _layernorm(sd, f"hash.gcl_i.mlp.lns.{i}")
    params = {
        "backbone": params_from_state_dict(backbone_sd, infer_config(backbone_sd)),
        "gcl": {
            "mlp": gcl_mlp,
            "concept": {
                "kernel": _np(sd["hash.gcl_i.common_concept_embedding.weight"]).T
            },
        },
        "lct_i": _mith_lct(sd, "hash.lct_i", k_bits, transformer_layers),
        "lct_t": _mith_lct(sd, "hash.lct_t", k_bits, transformer_layers),
        "img_concept_proj": _linear(sd, "hash.img_concept_proj"),
        "txt_concept_proj": _linear(sd, "hash.txt_concept_proj"),
    }
    return params, {}


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


def _dimch_token_hash(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """Reference TokenHash (models/DIMCH/hash/hash.py:18-52): Conv1d token
    mixer + 2-layer MLP. torch Conv1d weight (out, in, k) → flax Conv kernel
    (k, in, out)."""
    return {
        "token_layer": {
            "kernel": _np(sd[prefix + ".token_layer.weight"]).transpose(2, 1, 0),
            "bias": _np(sd[prefix + ".token_layer.bias"]),
        },
        "fc1": _linear(sd, prefix + ".hash_layer.0"),
        "fc2": _linear(sd, prefix + ".hash_layer.3"),
    }


def dimch_from_torch_state(
    state_dict: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference DIMCH state_dict → (params, model_state)."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    backbone_sd = {
        k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")
    }
    params = {
        "backbone": params_from_state_dict(backbone_sd, infer_config(backbone_sd)),
        "hash_img": _dimch_token_hash(sd, "hash.img_token_hash"),
        "hash_txt": _dimch_token_hash(sd, "hash.txt_token_hash"),
    }
    return params, {}


def baseline_from_torch_state(
    state_dict: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference Baseline state_dict → (params, model_state): two 2-layer
    MLP tanh heads (models/baseline/model.py:27-47)."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    backbone_sd = {
        k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")
    }

    def mlp(prefix):
        return {"fc1": _linear(sd, prefix + ".0"),
                "fc2": _linear(sd, prefix + ".3")}

    params = {
        "backbone": params_from_state_dict(backbone_sd, infer_config(backbone_sd)),
        "hash_img": mlp("hash.img_hash"),
        "hash_txt": mlp("hash.txt_hash"),
    }
    return params, {}


def _torch_decoder_layer(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """torch nn.TransformerDecoderLayer → our decoder layer subtree."""
    return {
        "self_attn": _attention(sd, prefix + ".self_attn"),
        "cross_attn": _attention(sd, prefix + ".multihead_attn"),
        "linear1": _linear(sd, prefix + ".linear1"),
        "linear2": _linear(sd, prefix + ".linear2"),
        "norm1": {"ln": _layernorm(sd, prefix + ".norm1")},
        "norm2": {"ln": _layernorm(sd, prefix + ".norm2")},
        "norm3": {"ln": _layernorm(sd, prefix + ".norm3")},
    }


def _torch_moe_decoder_layer(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """torch SoftMoEDecoderLayer → our moe decoder layer subtree. The
    reference's expert weights are already batched (num_experts, in, out)
    and phi is (in, n, p) (models/UMoED/hash/block/SoftMoe.py:34-37,137-143)
    — identical layouts to our SoftMoE params, no transpose needed. Its
    first FFN linear is named ``linear`` (block/transformer.py:224) where
    the plain torch layer calls it ``linear1``."""
    return {
        "self_attn": _attention(sd, prefix + ".self_attn"),
        "cross_attn": _attention(sd, prefix + ".multihead_attn"),
        "linear1": _linear(sd, prefix + ".linear"),
        "moe": {
            "phi": sd[prefix + ".moe.phi"],
            "expert_kernel": sd[prefix + ".moe.experts.weight"],
            "expert_bias": sd[prefix + ".moe.experts.bias"],
        },
        "norm1": {"ln": _layernorm(sd, prefix + ".norm1")},
        "norm2": {"ln": _layernorm(sd, prefix + ".norm2")},
        "norm3": {"ln": _layernorm(sd, prefix + ".norm3")},
    }


def _umoed_head(sd: Dict[str, Any], pre: str, decoder_layers: int) -> Dict[str, Any]:
    """One TokenHash head (slots + decoder stack + classifier); MoE layers
    auto-detected from the presence of ``.moe.phi`` keys."""
    head: Dict[str, Any] = {
        "slots": sd[f"{pre}.decoder_learned_parameters"],
        "classifier": _linear(sd, f"{pre}.classifier"),
    }
    if f"{pre}.first_layer.weight" in sd:
        head["first_layer"] = _linear(sd, f"{pre}.first_layer")
    for i in range(decoder_layers):
        layer_pre = f"{pre}.decoder.layers.{i}"
        if f"{layer_pre}.moe.phi" in sd:
            head[f"layer_{i}"] = _torch_moe_decoder_layer(sd, layer_pre)
        else:
            head[f"layer_{i}"] = _torch_decoder_layer(sd, layer_pre)
    return head


def umoed_from_torch_state(
    state_dict: Dict[str, Any], decoder_layers: int = 6,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference UMoED state_dict → (params, model_state). A TokenHash head
    is learned query slots → torch TransformerDecoder (plain or Soft-MoE) →
    classifier (models/UMoED/hash/hash_moe.py:22-60). ``fusion=True`` ships
    one shared head (hash_moe.py:102-111); non-fusion ships img/txt heads
    (hash_moe.py:105-111), both converted when present."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    backbone_sd = {
        k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")
    }
    params: Dict[str, Any] = {
        "backbone": params_from_state_dict(backbone_sd, infer_config(backbone_sd)),
    }
    if "hash.hash_module.decoder_learned_parameters" in sd:
        params["hash_module"] = _umoed_head(sd, "hash.hash_module", decoder_layers)
    else:
        params["hash_img"] = _umoed_head(sd, "hash.img_token_hash", decoder_layers)
        params["hash_txt"] = _umoed_head(sd, "hash.txt_token_hash", decoder_layers)
    return params, {}


# TwDH reuses DCMHT's HashLayer verbatim at long_dim
# (/root/reference/models/TwDH/TwDH.py:31); its centers/transform matrices
# are plain (unregistered) tensors that both frameworks load from the same
# pkl assets, so the DCMHT converter covers the whole TwDH state_dict.
twdh_from_torch_state = dcmht_from_torch_state
