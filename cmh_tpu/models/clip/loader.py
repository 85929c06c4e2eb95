"""Checkpoint import: OpenAI/torch CLIP state_dict → flax param tree.

Mirrors the reference's shape-driven architecture inference
(/root/reference/models/CLIP/model.py:438-467) and jit-archive fallback
(models/base.py:18-31): ``load_clip_checkpoint`` accepts a TorchScript
archive or a plain state_dict ``.pt``/``.pth``, infers the ViT geometry from
tensor shapes, and emits fp32 flax params in this package's CLIP layout.
When no checkpoint exists the caller falls back to random init (the
zero-egress build environment has no ``ViT-B-32.pt``; the reference instead
hard-exits — models/base.py:29-31).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .model import CLIP, CLIPConfig


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x,
                      dtype=np.float32)


def read_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint (TorchScript archive or raw state_dict)."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        state_dict = model.state_dict()
    except RuntimeError:
        try:
            state_dict = torch.load(path, map_location="cpu", weights_only=True)
        except Exception:
            # weights_only rejects pickled nn.Module checkpoints; loading
            # those executes arbitrary pickled code — only do it with a
            # warning, for reference-parity with torch.load of full models
            import warnings

            warnings.warn(
                f"{path} is not a plain state_dict; falling back to "
                "unsafe torch.load(weights_only=False)"
            )
            state_dict = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(state_dict, "state_dict"):
            state_dict = state_dict.state_dict()
    return {k: _t(v) for k, v in state_dict.items()}


def infer_config(
    state_dict: Dict[str, np.ndarray], dtype=jnp.bfloat16
) -> CLIPConfig:
    """Infer CLIPConfig from checkpoint tensor shapes (ViT variants).

    Same inference rules as the reference build_model (model.py:438-460).
    RN checkpoints go through the ModifiedResNet tower instead
    (``resnet_config_from_state_dict`` / ``models.clip.resnet``); every
    hashing method in the framework uses the ViT tower.
    """
    assert "visual.proj" in state_dict, (
        "this is an RN checkpoint — use resnet_config_from_state_dict / "
        "models.clip.resnet.ModifiedResNet (no hashing method uses it)"
    )
    vision_width = state_dict["visual.conv1.weight"].shape[0]
    vision_layers = len(
        [
            k
            for k in state_dict
            if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")
        ]
    )
    vision_patch_size = state_dict["visual.conv1.weight"].shape[-1]
    grid_size = round((state_dict["visual.positional_embedding"].shape[0] - 1) ** 0.5)
    image_resolution = vision_patch_size * grid_size
    embed_dim = state_dict["text_projection"].shape[1]
    context_length = state_dict["positional_embedding"].shape[0]
    vocab_size = state_dict["token_embedding.weight"].shape[0]
    transformer_width = state_dict["ln_final.weight"].shape[0]
    transformer_layers = len(
        set(
            k.split(".")[2]
            for k in state_dict
            if k.startswith("transformer.resblocks")
        )
    )
    return CLIPConfig(
        embed_dim=embed_dim,
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=context_length,
        vocab_size=vocab_size,
        transformer_width=transformer_width,
        transformer_heads=transformer_width // 64,
        transformer_layers=transformer_layers,
        dtype=dtype,
    )


def _ln(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {"ln": {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}}


def _block(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {
        "attn": {
            "in_proj_kernel": sd[f"{prefix}.attn.in_proj_weight"].T,
            "in_proj_bias": sd[f"{prefix}.attn.in_proj_bias"],
            "out_proj_kernel": sd[f"{prefix}.attn.out_proj.weight"].T,
            "out_proj_bias": sd[f"{prefix}.attn.out_proj.bias"],
        },
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "c_fc": {
            "kernel": sd[f"{prefix}.mlp.c_fc.weight"].T,
            "bias": sd[f"{prefix}.mlp.c_fc.bias"],
        },
        "c_proj": {
            "kernel": sd[f"{prefix}.mlp.c_proj.weight"].T,
            "bias": sd[f"{prefix}.mlp.c_proj.bias"],
        },
    }


def params_from_state_dict(
    state_dict: Dict[str, np.ndarray], cfg: CLIPConfig
) -> Dict[str, Any]:
    """torch CLIP state_dict → flax param tree for ``model.CLIP``."""
    sd = state_dict
    visual = {
        # torch conv weight (out, in, kh, kw) → flax kernel (kh, kw, in, out)
        "conv1": {"kernel": sd["visual.conv1.weight"].transpose(2, 3, 1, 0)},
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": sd["visual.proj"],
        "transformer": {
            f"resblocks_{i}": _block(sd, f"visual.transformer.resblocks.{i}")
            for i in range(cfg.vision_layers)
        },
    }
    params = {
        "visual": visual,
        "transformer": {
            f"resblocks_{i}": _block(sd, f"transformer.resblocks.{i}")
            for i in range(cfg.transformer_layers)
        },
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "positional_embedding": sd["positional_embedding"],
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": sd["text_projection"],
        "logit_scale": sd["logit_scale"],
    }
    return jax.tree_util.tree_map(jnp.asarray, params)


def load_backbone(
    clip_path: str,
    rng: Optional[jax.Array] = None,
    dtype=jnp.bfloat16,
    fallback_config: Optional[CLIPConfig] = None,
) -> Tuple[CLIPConfig, CLIP, Dict[str, Any]]:
    """Build the CLIP backbone: pretrained import when the checkpoint exists,
    seeded random init otherwise.

    Returns (config, module, params). Equivalent role to the reference
    BaseModel.load_backbone (models/base.py:18-31), with random-init fallback
    instead of sys.exit when the checkpoint is missing.
    """
    if clip_path and os.path.exists(clip_path):
        sd = read_torch_state_dict(clip_path)
        cfg = infer_config(sd, dtype=dtype)
        module = CLIP(cfg)
        params = params_from_state_dict(sd, cfg)
        return cfg, module, {"params": params}

    cfg = fallback_config or CLIPConfig(dtype=dtype)
    module = CLIP(cfg)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    dummy_img = jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3), jnp.float32)
    dummy_txt = jnp.zeros((1, cfg.context_length), jnp.int32)
    variables = module.init(rng, dummy_img, dummy_txt)
    return cfg, module, variables


# --------------------------------------------------------------- ResNet tower
def resnet_config_from_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Infer ModifiedResNet geometry from a (prefix-stripped) visual state
    dict — same rules as reference build_model (model.py:449-456)."""
    counts = tuple(
        len({k.split(".")[1] for k in sd if k.startswith(f"layer{b}.")})
        for b in (1, 2, 3, 4)
    )
    width = sd["layer1.0.conv1.weight"].shape[0]
    output_width = round((sd["attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
    output_dim = sd["attnpool.c_proj.weight"].shape[0]
    embed_dim = width * 32
    return dict(
        layers=counts,
        width=width,
        input_resolution=output_width * 32,
        output_dim=output_dim,
        heads=embed_dim // 64,
    )


def resnet_variables_from_state_dict(sd: Dict[str, np.ndarray], layers) -> Dict:
    """torch ModifiedResNet state dict (prefix-stripped) → flax variables
    ({'params': …, 'batch_stats': …}) for models.clip.resnet.ModifiedResNet."""

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv(dst, src):
        params[dst] = {"kernel": sd[f"{src}.weight"].transpose(2, 3, 1, 0)}

    def bn(dst, src):
        params[dst] = {"scale": sd[f"{src}.weight"], "bias": sd[f"{src}.bias"]}
        stats[dst] = {
            "mean": sd[f"{src}.running_mean"],
            "var": sd[f"{src}.running_var"],
        }

    for i in (1, 2, 3):
        conv(f"conv{i}", f"conv{i}")
        bn(f"bn{i}", f"bn{i}")

    for stage in range(1, 5):
        for blk in range(layers[stage - 1]):
            src = f"layer{stage}.{blk}"
            dst = f"layer{stage}_{blk}"
            bparams: Dict[str, Any] = {}
            bstats: Dict[str, Any] = {}
            for ci in (1, 2, 3):
                bparams[f"conv{ci}"] = {
                    "kernel": sd[f"{src}.conv{ci}.weight"].transpose(2, 3, 1, 0)
                }
                bparams[f"bn{ci}"] = {
                    "scale": sd[f"{src}.bn{ci}.weight"],
                    "bias": sd[f"{src}.bn{ci}.bias"],
                }
                bstats[f"bn{ci}"] = {
                    "mean": sd[f"{src}.bn{ci}.running_mean"],
                    "var": sd[f"{src}.bn{ci}.running_var"],
                }
            if f"{src}.downsample.0.weight" in sd:
                bparams["downsample_conv"] = {
                    "kernel": sd[f"{src}.downsample.0.weight"].transpose(2, 3, 1, 0)
                }
                bparams["downsample_bn"] = {
                    "scale": sd[f"{src}.downsample.1.weight"],
                    "bias": sd[f"{src}.downsample.1.bias"],
                }
                bstats["downsample_bn"] = {
                    "mean": sd[f"{src}.downsample.1.running_mean"],
                    "var": sd[f"{src}.downsample.1.running_var"],
                }
            params[dst] = bparams
            stats[dst] = bstats

    attn = {
        "positional_embedding": sd["attnpool.positional_embedding"],
    }
    for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
        attn[proj] = {
            "kernel": sd[f"attnpool.{proj}.weight"].T,
            "bias": sd[f"attnpool.{proj}.bias"],
        }
    params["attnpool"] = attn

    to_jnp = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)
    return {"params": to_jnp(params), "batch_stats": to_jnp(stats)}
