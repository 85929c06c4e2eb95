"""StableHLO export of trained encoders for python-free serving.

The reference has no deployment story beyond pickled torch modules
(SURVEY.md §5); here a trained method's image/text encode paths (backbone +
hash head + binarization) export as serialized StableHLO with the weights
baked in — loadable via ``jax.export.deserialize`` (or any StableHLO
runtime) without the model code, configs, or checkpoint plumbing:

    from cmh_tpu.export import export_encoders, load_encoders
    export_encoders(method, variables, "encoders.cmh")
    enc = load_encoders("encoders.cmh")
    img_codes = enc.encode_image(images)            # (B, K) ±1 codes
    txt_codes = enc.encode_text(tokens, kpm)

The exported functions are exactly the trainer's eval path: the method's
``encode_image``/``encode_text`` (eval-ready per method — e.g. DNPH drops
its class predictions, MITH combines cls+token hashes) followed by
``make_hash_code`` applied per output leaf, matching
``runners/base.py:_scatter_codes``. Methods whose encode returns a pytree
(TwDH's multi-dim codes) export the same pytree of ±1 codes.

By default the batch dimension is exported symbolically
(``jax.export.symbolic_shape``) so one serialized artifact serves ANY batch
size without retracing or caller-side padding; pass ``batch=<int>`` to pin
a static batch instead (the compiled executable is then specialized to that
shape). Pair with ``cmh_tpu.serving.RetrievalIndex`` for the query path.
"""

from __future__ import annotations

import zipfile
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_MAGIC = "cmh-encoders-v1"


def export_encoders(method, variables: Any, path: str, batch: int | None = None,
                    max_words: int = 32, method_state: Any = None) -> None:
    """Serialize the method's eval-time encode paths with weights baked in.

    ``batch=None`` (default) exports a symbolic batch dimension — the loaded
    encoders accept any batch size. An int pins a static batch.

    ``method_state`` supplies eval-time constants some methods fold into
    their codes (TwDH's ``trans`` projection matrices → multi-dim pytree
    codes, runners/twdh.py:44-58); they are baked into the artifact like
    the weights."""
    import inspect

    from jax import export as jx

    res = method.clip_cfg.image_resolution
    make = method.make_hash_code

    # eval-time kwargs beyond (inputs, train): currently TwDH's `trans`
    extra = {}
    sig = inspect.signature(type(method.module).encode_image)
    if "trans" in sig.parameters:
        if not (method_state and method_state.get("trans")):
            raise ValueError(
                "this method folds eval-time 'trans' constants into its "
                "codes (TwDH short dims) — pass "
                "method_state=method.eval_method_state(); exporting without "
                "them would silently drop every short-code head"
            )
        extra["trans"] = jax.tree_util.tree_map(
            jnp.asarray, method_state["trans"])

    def encode_image(image):                        # (B, H, W, 3) float32
        h = method.module.apply(
            variables, image, train=False, **extra,
            method=lambda m, x, train, **kw: m.encode_image(x, train=train, **kw),
        )
        return jax.tree_util.tree_map(make, h)

    def encode_text(text, kpm):                     # (B, W) int32 / bool
        h = method.module.apply(
            variables, text, kpm, train=False, **extra,
            method=lambda m, t, k, train, **kw: m.encode_text(t, k, train=train, **kw),
        )
        return jax.tree_util.tree_map(make, h)

    if batch is None:
        (b,) = jx.symbolic_shape("b")
    else:
        b = batch
    img_spec = jax.ShapeDtypeStruct((b, res, res, 3), jnp.float32)
    txt_spec = jax.ShapeDtypeStruct((b, max_words), jnp.int32)
    kpm_spec = jax.ShapeDtypeStruct((b, max_words), jnp.bool_)

    img_exp = jx.export(jax.jit(encode_image))(img_spec)
    txt_exp = jx.export(jax.jit(encode_text))(txt_spec, kpm_spec)

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("magic", _MAGIC)
        z.writestr("image.stablehlo", img_exp.serialize())
        z.writestr("text.stablehlo", txt_exp.serialize())


class LoadedEncoders:
    """Deserialized encode functions — no model code needed to run."""

    def __init__(self, img_exp, txt_exp):
        self._img = img_exp
        self._txt = txt_exp

    def encode_image(self, image):
        out = self._img.call(jnp.asarray(image, jnp.float32))
        return jax.tree_util.tree_map(np.asarray, out)

    def encode_text(self, text, key_padding_mask):
        out = self._txt.call(jnp.asarray(text, jnp.int32),
                             jnp.asarray(key_padding_mask, bool))
        return jax.tree_util.tree_map(np.asarray, out)


def load_encoders(path: str) -> LoadedEncoders:
    from jax import export as jx

    with zipfile.ZipFile(path) as z:
        # explicit check (asserts vanish under python -O): a wrong file
        # should fail HERE with a named error, not deep in deserialize
        try:
            magic = z.read("magic").decode()
        except KeyError:
            magic = "<missing>"
        if magic != _MAGIC:
            raise ValueError(
                f"{path!r} is not a cmh encoder export "
                f"(magic {magic!r}, expected {_MAGIC!r})"
            )
        img = jx.deserialize(bytearray(z.read("image.stablehlo")))
        txt = jx.deserialize(bytearray(z.read("text.stablehlo")))
    return LoadedEncoders(img, txt)


def main(argv=None):
    """CLI: export a trained run's encoders.

    python -m cmh_tpu.export --config-file configs/DCMHT/config.yaml \
        --model result/.../model-9.msgpack --out encoders.cmh [--batch 256]
    """
    import argparse
    import os

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--model", required=True,
                    help="weights msgpack from a training run (model-N.msgpack)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=None,
                    help="pin a static batch size (default: symbolic batch — "
                         "the export serves any batch without retracing)")
    args = ap.parse_args(argv)

    import jax

    if os.environ.get("CMH_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["CMH_TPU_PLATFORM"])

    import cmh_tpu  # noqa: F401  (registers methods)
    from .config import load_config
    from .registry import registry

    cfg = load_config(args.config_file)
    method_cls = registry.require_model_class(cfg.model.get("arch", "DCMHT"))
    method = method_cls.from_config(
        cfg.model, output_dim=cfg.run.get("output_dim", 16),
        train_num=cfg.run.get("train_num", 10000))
    res = method.clip_cfg.image_resolution
    max_words = cfg.dataset.get("max_word", 32)
    sample = {
        "image": jnp.zeros((2, res, res, 3), jnp.float32),
        "text": jnp.zeros((2, max_words), jnp.int32),
        "key_padding_mask": jnp.zeros((2, max_words), bool),
    }
    variables = method.init_variables(jax.random.PRNGKey(0), sample)
    from .runners.base import BaseTrainer

    params, model_state = BaseTrainer.load_model_file(
        args.model, variables["params"],
        {k: v for k, v in variables.items() if k != "params"})
    # explicit method-level accessor (raises on a trans-less TwDH rather
    # than silently exporting long-code-only encoders)
    method_state = method.eval_method_state() or None
    export_encoders(method, {"params": params, **model_state}, args.out,
                    batch=args.batch, max_words=max_words,
                    method_state=method_state)
    print(f"exported encoders to {args.out}")


if __name__ == "__main__":
    import sys

    sys.exit(main())
