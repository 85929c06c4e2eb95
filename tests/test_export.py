"""StableHLO encoder export: parity with the live model, no model code on load."""

import numpy as np
import jax
import jax.numpy as jnp

from cmh_tpu.config import config_from_dict
from cmh_tpu.export import export_encoders, load_encoders
from cmh_tpu.models.dcmht import DCMHTMethod


def test_export_roundtrip_matches_live_model(tmp_path):
    cfg_model = config_from_dict(
        {"model": {"clip_variant": "tiny", "hash_func": "softmax"}}).model
    method = DCMHTMethod.from_config(cfg_model, output_dim=8)
    res = method.clip_cfg.image_resolution
    B, W = 4, 12
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(B, res, res, 3), jnp.float32)
    text = jnp.asarray(rng.randint(1, 49405, (B, W)), jnp.int32)
    kpm = jnp.zeros((B, W), bool)
    variables = method.init_variables(
        jax.random.PRNGKey(0),
        {"image": image, "text": text, "key_padding_mask": kpm})

    path = str(tmp_path / "enc.cmh")
    export_encoders(method, variables, path, batch=B, max_words=W)
    enc = load_encoders(path)

    got_i = enc.encode_image(image)
    got_t = enc.encode_text(text, kpm)

    # live-model reference: method encode + make_hash_code (the trainer's
    # eval path, runners/base.py:_scatter_codes)
    want_i = method.make_hash_code(method.module.apply(
        variables, image, train=False,
        method=lambda m, x, train: m.encode_image(x, train=train)))
    want_t = method.make_hash_code(method.module.apply(
        variables, text, kpm, train=False,
        method=lambda m, t, k, train: m.encode_text(t, k, train=train)))

    np.testing.assert_array_equal(got_i, np.asarray(want_i))
    np.testing.assert_array_equal(got_t, np.asarray(want_t))
    assert set(np.unique(got_i)) <= {-1.0, 1.0}


def test_export_mith_combined_codes(tmp_path):
    """MITH's eval code is cls+token combined inside its encode_* — the
    export captures that method-specific seam too."""
    from cmh_tpu.models.mith import MITHMethod

    cfg_model = config_from_dict(
        {"model": {"clip_variant": "tiny", "hash_func": "tanh"}}).model
    method = MITHMethod.from_config(cfg_model, output_dim=8, train_num=32)
    res = method.clip_cfg.image_resolution
    B, W = 4, 12
    rng = np.random.RandomState(1)
    image = jnp.asarray(rng.randn(B, res, res, 3), jnp.float32)
    text = jnp.asarray(rng.randint(1, 49405, (B, W)), jnp.int32)
    kpm = jnp.zeros((B, W), bool)
    variables = method.init_variables(
        jax.random.PRNGKey(0),
        {"image": image, "text": text, "key_padding_mask": kpm})

    path = str(tmp_path / "mith.cmh")
    export_encoders(method, variables, path, batch=B, max_words=W)
    enc = load_encoders(path)
    got = enc.encode_image(image)
    want = method.make_hash_code(method.module.apply(
        variables, image, train=False,
        method=lambda m, x, train: m.encode_image(x, train=train)))
    np.testing.assert_array_equal(got, np.asarray(want))
