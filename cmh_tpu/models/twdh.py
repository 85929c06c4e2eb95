"""TwDH: two-step discrete hashing (long codes → derived short codes).

Re-implementation of /root/reference/models/TwDH/TwDH.py: reuses the DCMHT
softmax-pair HashLayer at ``long_dim`` (512/1024/2048); short codes come
from learned transform matrices applied in the pair-probability space:
``short[k] = softmax_hash(long_hash @ trans[k])`` (TwDH.py:66-85). Loss =
BCE of the pair probabilities against hash-center targets (per-sample
sign-mean of the sample's class centers) for the long code and each short
code, plus soft-argmax quantization terms, weighted by ``quan_alpha`` and
``low_rate`` (TwDH.py:132-184).

Center/transform assets load from the reference's torch pickles when paths
exist; otherwise CSQ Hadamard centers are generated natively and transforms
can be trained with ``cmh_tpu.tools.twdh_matrix`` (the reference's offline
tool, runners/TwDH/transform_matrix_generation/).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hash_centers import (
    bce_probs,
    generate_hash_centers,
    hash_center_multilabels,
    hash_convert,
    load_center_file,
)
from ..registry import registry
from .base import BaseHashModel, Method, resolve_clip_cfg
from .clip.model import CLIP, CLIPConfig
from .dcmht import ModalityHash, soft_argmax_hash_loss


class TwDHModel(BaseHashModel):
    clip_cfg: CLIPConfig
    output_dim: int = 512          # == long_dim (HashLayer width)
    short_dims: tuple = (16,)
    hash_func: str = "softmax"

    def setup(self):
        self.backbone = CLIP(self.clip_cfg)
        embed = self.clip_cfg.embed_dim
        self.img_hash = ModalityHash(
            embed, self.output_dim, layernorm=False, hash_func=self.hash_func,
            name="hash_img",
        )
        self.txt_hash = ModalityHash(
            embed, self.output_dim, layernorm=True, hash_func=self.hash_func,
            name="hash_txt",
        )

    def _short(self, long_hash, trans: Dict[str, jax.Array]):
        # the reference routes short codes through the SAME configured
        # activation as the long head (self.hash.quantization,
        # TwDH.py:73,83) — hardcoding softmax would silently mix a tanh
        # long head with softmax short codes
        act = _short_activation(self.hash_func)
        return {
            k: act(long_hash @ v.astype(jnp.float32))
            for k, v in trans.items()
        }

    def encode_image(self, image, train: bool = True, trans=None):
        cls_token, _, _ = self.backbone.encode_image(image)
        long_hash = self.img_hash(cls_token.astype(jnp.float32), train=train)
        if trans is None:
            return long_hash
        return long_hash, self._short(long_hash, trans)

    def encode_text(self, text, key_padding_mask=None, train: bool = True,
                    trans=None):
        eos_token, _, _, _ = self.backbone.encode_text(text, key_padding_mask)
        long_hash = self.txt_hash(eos_token.astype(jnp.float32), train=train)
        if trans is None:
            return long_hash
        return long_hash, self._short(long_hash, trans)


def _short_activation(hash_func: str):
    """Short-code activation = the configured long-head activation
    (reference HashLayer.quantization dispatch, TwDH.py:31,73)."""
    from ..ops.hashing import softmax_hash, tanh_hash

    try:
        return {"softmax": softmax_hash, "tanh": tanh_hash}[hash_func]
    except KeyError:
        raise ValueError(
            f"TwDH hash_func {hash_func!r} has no short-code activation "
            "(reference supports softmax/tanh)"
        ) from None


def twdh_loss_fn(*, quan_alpha: float, low_rate: float, noise_key: jax.Array,
                 hash_func: str = "softmax"):
    def loss(outputs, batch, method_state, step):
        img_long, txt_long = outputs
        labels = batch["label"]
        long_center = method_state["long_center"]
        short_centers = method_state["short_centers"]
        trans = method_state["trans"]
        key = jax.random.fold_in(noise_key, step)

        target = hash_convert(
            hash_center_multilabels(labels, long_center, key)
        )
        long_img_loss = bce_probs(img_long, target)
        long_txt_loss = bce_probs(txt_long, target)
        long_nce = (long_img_loss + long_txt_loss) / 2.0
        quan_img = soft_argmax_hash_loss(img_long)
        quan_txt = soft_argmax_hash_loss(txt_long)
        long_quan = (quan_img + quan_txt) / 2.0

        total = long_nce + quan_alpha * long_quan
        short_dict = {}
        act = _short_activation(hash_func)

        for k in sorted(short_centers.keys()):
            sc, tr = short_centers[k], trans[k]
            s_img = act(img_long @ tr)
            s_txt = act(txt_long @ tr)
            s_target = hash_convert(hash_center_multilabels(labels, sc, key))
            s_nce = (bce_probs(s_img, s_target) + bce_probs(s_txt, s_target)) / 2.0
            s_quan = (soft_argmax_hash_loss(s_img) + soft_argmax_hash_loss(s_txt)) / 2.0
            total = total + low_rate * s_nce + low_rate * s_quan
            short_dict[k] = {"NCE": s_nce, "Quan": s_quan}

        loss_dict = {
            "All loss": total,
            "Long": {
                "NCE": {"image": long_img_loss, "text": long_txt_loss},
                "Quan": {"image": quan_img, "text": quan_txt},
            },
            "Short": short_dict,
        }
        return total, loss_dict, method_state

    return loss


@registry.register_model("TwDH")
class TwDHMethod(Method):
    arch = "TwDH"
    code_mode = "pair_argmax"

    def __init__(self, module, loss, cfg_model=None, train_num=10000,
                 long_center=None, short_centers=None, trans=None):
        super().__init__(module, loss, cfg_model, train_num)
        self._long_center = long_center
        self._short_centers = short_centers
        self._trans = trans

    @property
    def short_dims(self):
        return sorted(int(k) for k in self._short_centers.keys())

    @classmethod
    def from_config(cls, cfg_model, output_dim: int = 16, train_num: int = 10000,
                    clip_cfg: Optional[CLIPConfig] = None) -> "TwDHMethod":
        clip_cfg = resolve_clip_cfg(cfg_model, clip_cfg)
        g = (lambda k, d: cfg_model.get(k, d)) if cfg_model else (lambda k, d: d)
        long_dim = g("long_dim", 512)
        numclass = g("numclass", 80)
        short_dims = g("short_dims", [output_dim])
        short_dims = [int(s) for s in short_dims]

        long_center_dir = g("long_center", "./data/transformer/TwDH/center/long")
        short_center_dir = g("short_center", "./data/transformer/TwDH/center/short")
        trans_dir = g("trans_matrix", "./data/transformer/TwDH/center/trans")

        long_path = os.path.join(str(long_center_dir), f"{long_dim}.pkl")
        if os.path.isfile(long_path):
            long_center = load_center_file(long_path)
        else:
            long_center = generate_hash_centers(numclass, long_dim, seed=13)

        short_centers, trans = {}, {}
        rng = np.random.RandomState(17)
        for sd in short_dims:
            sp = os.path.join(str(short_center_dir), f"{sd}.pkl")
            tp = os.path.join(str(trans_dir), str(long_dim), f"{sd}.pkl")
            if os.path.isfile(sp):
                short_centers[str(sd)] = load_center_file(sp)
            else:
                short_centers[str(sd)] = generate_hash_centers(numclass, sd, seed=14)
            if os.path.isfile(tp):
                trans[str(sd)] = load_center_file(tp)
            else:
                trans[str(sd)] = rng.randn(2 * long_dim, 2 * sd).astype(
                    np.float32
                ) / np.sqrt(2 * long_dim)

        module = TwDHModel(
            clip_cfg=clip_cfg, output_dim=long_dim,
            short_dims=tuple(short_dims), hash_func=g("hash_func", "softmax"),
        )
        loss = twdh_loss_fn(
            quan_alpha=g("quan_alpha", 0.5), low_rate=g("low_rate", 0),
            noise_key=jax.random.PRNGKey(g("center_seed", 0)),
            hash_func=g("hash_func", "softmax"),
        )
        return cls(module=module, loss=loss, cfg_model=cfg_model,
                   train_num=train_num, long_center=long_center,
                   short_centers=short_centers, trans=trans)

    def init_method_state(self) -> Dict[str, Any]:
        return {
            "long_center": jnp.asarray(self._long_center),
            "short_centers": {k: jnp.asarray(v)
                              for k, v in self._short_centers.items()},
            "trans": {k: jnp.asarray(v) for k, v in self._trans.items()},
        }

    def eval_method_state(self) -> Dict[str, Any]:
        """Short-dim ``trans`` projections the eval/export encode path folds
        into the codes — fails loudly rather than letting an export silently
        ship long-code-only encoders."""
        trans = {k: jnp.asarray(v) for k, v in (self._trans or {}).items()}
        if not trans:
            raise ValueError(
                "TwDH has no trans matrices loaded — every short-code head "
                "would be missing from eval/export"
            )
        return {"trans": trans}
