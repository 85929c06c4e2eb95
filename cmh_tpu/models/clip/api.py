"""Standalone CLIP loader/tokenizer API.

Parity surface for the reference's stand-alone module
(/root/reference/models/CLIP/clip.py:86-224): ``available_models()``,
``load()`` and ``tokenize()``. The reference downloads TorchScript archives
with SHA256 verification (clip.py:39-68); this build environment has zero
egress, so ``load`` only accepts local checkpoint paths (the reference also
accepts those) and falls back to a named random-init config otherwise.
"""

from __future__ import annotations

import os
from typing import List, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .loader import load_backbone
from .model import CLIP, CLIPConfig
from .tokenizer import EOT_ID, SOT_ID, SimpleTokenizer

_MODEL_CONFIGS = {
    "ViT-B/32": CLIPConfig(),
    "ViT-B/16": CLIPConfig(vision_patch_size=16),
    "ViT-L/14": CLIPConfig(
        embed_dim=768, vision_layers=24, vision_width=1024,
        vision_patch_size=14, transformer_width=768, transformer_heads=12,
        transformer_layers=12,
    ),
}

_tokenizer = None


def available_models() -> List[str]:
    return list(_MODEL_CONFIGS.keys())


def load(
    name: str = "ViT-B/32",
    checkpoint_path: str = "",
    dtype=jnp.bfloat16,
    rng: jax.Array = None,
) -> Tuple[CLIP, dict, CLIPConfig]:
    """Build (module, variables, config).

    ``checkpoint_path`` pointing at a TorchScript archive or state_dict .pt
    imports pretrained weights with shape-driven config inference; otherwise
    the named config is randomly initialized.
    """
    if checkpoint_path and os.path.exists(checkpoint_path):
        cfg, module, variables = load_backbone(checkpoint_path, dtype=dtype)
        return module, variables, cfg
    assert name in _MODEL_CONFIGS, (
        f"unknown model '{name}'; available: {available_models()}"
    )
    cfg = CLIPConfig(**{**_MODEL_CONFIGS[name].__dict__, "dtype": dtype})
    cfg2, module, variables = load_backbone("", rng=rng, dtype=dtype,
                                            fallback_config=cfg)
    return module, variables, cfg2


def tokenize(
    texts: Union[str, List[str]], context_length: int = 77,
    truncate: bool = False,
) -> np.ndarray:
    """Reference tokenize() (clip.py:188-224): [SOT] + BPE + [EOT], zero-pad
    to context_length; overlong inputs raise unless ``truncate``."""
    global _tokenizer
    if _tokenizer is None:
        _tokenizer = SimpleTokenizer()
    if isinstance(texts, str):
        texts = [texts]
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        tokens = [SOT_ID] + _tokenizer.encode(text) + [EOT_ID]
        if len(tokens) > context_length:
            if truncate:
                tokens = tokens[:context_length]
                tokens[-1] = EOT_ID
            else:
                raise RuntimeError(
                    f"Input {text} is too long for context length "
                    f"{context_length}"
                )
        result[i, : len(tokens)] = tokens
    return result
