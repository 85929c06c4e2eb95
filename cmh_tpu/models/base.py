"""Method framework: each hashing method = flax module + pure loss + code fn.

The reference isolates method differences behind three seams — hash-head
forward, ``object_function`` loss, and eval-code extraction
(/root/reference/models/base.py:35-51, runners/base.py:236-240,296-305).
This package makes those seams explicit and functional:

- ``method.module``: a flax module whose param tree has a top-level
  ``backbone`` (CLIP) submodule plus method-head submodules (``hash_img``,
  ``gcl``, ``proxies``, … — names vary per method). The optimizer partitions
  learning rates by these top-level keys: ``backbone`` gets the backbone lr,
  SGD-trained keys (e.g. ``proxies``) get their own transform, and everything
  else falls to the head-lr ``default`` partition (optim/partition.py) —
  mirroring the reference's two param groups (runners/base.py:136-137).
- ``method.loss(outputs, batch, method_state, step)``: a pure function
  returning (scalar loss, nested loss_dict, new method_state). Everything it
  touches is a jax array, so the whole train step jits into one XLA program.
- ``method.make_hash_code``: continuous relaxation → ±1 codes at eval.
- ``method.init_method_state()``: mutable training-state arrays (memory
  banks, proxies trained by a second optimizer, …) as explicit pytrees.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.hashing import pair_argmax_code, sign_code
from .clip.loader import load_backbone
from .clip.model import CLIP, CLIPConfig


class BaseHashModel(nn.Module):
    """flax base for method models: CLIP backbone + method hash head.

    Subclasses define ``setup`` creating ``self.backbone`` (CLIP) and the
    head modules, plus ``encode_image`` / ``encode_text`` returning the
    continuous codes used for both the loss and eval binarization.
    """

    clip_cfg: CLIPConfig
    output_dim: int = 16

    def __call__(self, image, text, key_padding_mask=None, train: bool = True):
        img = self.encode_image(image, train=train)
        txt = self.encode_text(text, key_padding_mask, train=train)
        return img, txt


class Method:
    """Bundle of everything the trainer needs for one hashing method."""

    #: registry arch name, e.g. "DCMHT"
    arch: str = "base"
    #: binarization used at eval (sign for tanh-style, pair-argmax for softmax)
    code_mode: str = "sign"
    #: injected by the trainer after the dataset is built; consumed by
    #: methods with train-set-sized state (MITH banks)
    train_labels = None

    def __init__(
        self,
        module: nn.Module,
        loss: Callable,
        cfg_model=None,
        train_num: int = 10000,
    ) -> None:
        self.module = module
        self.loss = loss
        self.cfg_model = cfg_model
        self.train_num = train_num

    # ------------------------------------------------------------- lifecycle
    def init_variables(self, rng: jax.Array, sample_batch: Dict[str, Any]):
        """Initialize params (+ mutable collections like batch_stats)."""
        variables = self.module.init(
            rng,
            jnp.asarray(sample_batch["image"]),
            jnp.asarray(sample_batch["text"]),
            jnp.asarray(sample_batch["key_padding_mask"]),
            train=False,
        )
        return variables

    def load_pretrained_backbone(self, variables, clip_path: str):
        """Overwrite the backbone subtree with an imported torch checkpoint."""
        import os

        if not clip_path or not os.path.exists(clip_path):
            return variables, False
        _, _, loaded = load_backbone(clip_path)
        params = dict(variables["params"])
        params["backbone"] = loaded["params"]
        out = dict(variables)
        out["params"] = params
        return out, True

    def init_method_state(self) -> Dict[str, Any]:
        return {}

    # ------------------------------------------------------------------ eval
    def make_hash_code(self, code: jax.Array) -> jax.Array:
        if self.code_mode == "pair_argmax":
            return pair_argmax_code(code)
        return sign_code(code)

    def eval_code_dims(self) -> int:
        """Width of the binarized eval code buffers."""
        return self.output_dim

    def eval_method_state(self) -> Dict[str, Any]:
        """Eval-time constants a deployed encoder must bake in alongside the
        weights (cmh_tpu.export). Methods whose encode path consumes parts
        of method_state override this — TwDH's short-dim ``trans``
        projections; default: none."""
        return {}

    # ------------------------------------------------------------ properties
    @property
    def output_dim(self) -> int:
        return self.module.output_dim

    @property
    def clip_cfg(self) -> CLIPConfig:
        return self.module.clip_cfg

    @classmethod
    def from_config(cls, cfg_model, output_dim: int = 16, train_num: int = 10000,
                    clip_cfg: Optional[CLIPConfig] = None) -> "Method":
        raise NotImplementedError()


def resolve_clip_cfg(cfg_model, clip_cfg: Optional[CLIPConfig]) -> CLIPConfig:
    """CLIP geometry: explicit override > clip_variant key > checkpoint
    shapes > ViT-B/32 defaults.

    ``clip_dtype`` in the model config selects the backbone matmul dtype
    (default bfloat16 — the TPU-native choice; ``float32`` gives exact
    torch-reference parity for validation runs)."""
    if clip_cfg is not None:
        return clip_cfg
    import os

    import jax.numpy as jnp

    dtype_name = cfg_model.get("clip_dtype", None) if cfg_model else None
    dtype = {
        None: None,
        "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
        "float32": jnp.float32, "fp32": jnp.float32,
        "float16": jnp.float16, "fp16": jnp.float16,
    }[dtype_name if dtype_name is None else str(dtype_name)]

    variant = cfg_model.get("clip_variant", None) if cfg_model else None
    if variant == "tiny":
        # tests default fp32 (exact torch parity on CPU)
        return CLIPConfig.tiny(dtype=dtype or jnp.float32)

    clip_path = cfg_model.get("clip_path", "./ViT-B-32.pt") if cfg_model else ""
    if clip_path and os.path.exists(clip_path):
        from .clip.loader import infer_config, read_torch_state_dict

        # real checkpoints default bf16 (the TPU-native matmul dtype)
        return infer_config(read_torch_state_dict(clip_path),
                            dtype=dtype or jnp.bfloat16)
    return CLIPConfig(dtype=dtype) if dtype else CLIPConfig()
