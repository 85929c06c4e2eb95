"""StableHLO encoder export: parity with the live model, no model code on load."""

import pytest
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


def _rand_batch(method, B, W, seed):
    res = method.clip_cfg.image_resolution
    rng = np.random.RandomState(seed)
    image = jnp.asarray(rng.randn(B, res, res, 3), jnp.float32)
    text = jnp.asarray(rng.randint(1, 49405, (B, W)), jnp.int32)
    kpm = jnp.zeros((B, W), bool)
    return image, text, kpm


def _live_codes(method, variables, image, text, kpm, **extra):
    make = method.make_hash_code
    want_i = jax.tree_util.tree_map(make, method.module.apply(
        variables, image, train=False, **extra,
        method=lambda m, x, train, **kw: m.encode_image(x, train=train, **kw)))
    want_t = jax.tree_util.tree_map(make, method.module.apply(
        variables, text, kpm, train=False, **extra,
        method=lambda m, t, k, train, **kw: m.encode_text(t, k, train=train, **kw)))
    return want_i, want_t


@pytest.mark.slow
def test_export_symbolic_batch_two_sizes(tmp_path):
    """Default export has a symbolic batch dim: one artifact serves B=3 and
    B=5 (pair-argmax method) with bit-exact parity (VERDICT r2 #6)."""
    cfg_model = config_from_dict(
        {"model": {"clip_variant": "tiny", "hash_func": "softmax"}}).model
    method = DCMHTMethod.from_config(cfg_model, output_dim=8)
    W = 12
    image, text, kpm = _rand_batch(method, 3, W, 7)
    variables = method.init_variables(
        jax.random.PRNGKey(0),
        {"image": image, "text": text, "key_padding_mask": kpm})

    path = str(tmp_path / "sym.cmh")
    export_encoders(method, variables, path, max_words=W)  # batch=None
    enc = load_encoders(path)

    for B, seed in ((3, 7), (5, 8)):
        image, text, kpm = _rand_batch(method, B, W, seed)
        want_i, want_t = _live_codes(method, variables, image, text, kpm)
        got_i = enc.encode_image(image)
        got_t = enc.encode_text(text, kpm)
        assert got_i.shape == (B, 8)
        np.testing.assert_array_equal(got_i, np.asarray(want_i))
        np.testing.assert_array_equal(got_t, np.asarray(want_t))


@pytest.mark.slow
def test_export_dsph_sign_codes(tmp_path):
    """Sign-mode method (DSPH) round-trips through a symbolic-batch export."""
    from cmh_tpu.models.dsph import DSPHMethod

    cfg_model = config_from_dict(
        {"model": {"clip_variant": "tiny", "numclass": 4}}).model
    method = DSPHMethod.from_config(cfg_model, output_dim=8, train_num=32)
    W = 12
    image, text, kpm = _rand_batch(method, 2, W, 3)
    variables = method.init_variables(
        jax.random.PRNGKey(1),
        {"image": image, "text": text, "key_padding_mask": kpm})

    path = str(tmp_path / "dsph.cmh")
    export_encoders(method, variables, path, max_words=W)
    enc = load_encoders(path)
    for B, seed in ((2, 3), (6, 4)):
        image, text, kpm = _rand_batch(method, B, W, seed)
        want_i, want_t = _live_codes(method, variables, image, text, kpm)
        got_i = enc.encode_image(image)
        got_t = enc.encode_text(text, kpm)
        assert set(np.unique(got_i)) <= {-1.0, 1.0}
        np.testing.assert_array_equal(got_i, np.asarray(want_i))
        np.testing.assert_array_equal(got_t, np.asarray(want_t))


def test_export_twdh_pytree_codes(tmp_path):
    """TwDH's eval output is a pytree (long code + per-short-dim codes via
    baked-in trans matrices); the export preserves structure and values at
    two batch sizes."""
    from cmh_tpu.models.twdh import TwDHMethod

    cfg_model = config_from_dict(
        {"model": {"clip_variant": "tiny", "long_dim": 32, "numclass": 4,
                   "short_dims": [8, 16],
                   "long_center": "/nonexistent", "short_center": "/nonexistent",
                   "trans_matrix": "/nonexistent"}}).model
    method = TwDHMethod.from_config(cfg_model, output_dim=8, train_num=32)
    W = 12
    image, text, kpm = _rand_batch(method, 2, W, 5)
    variables = method.init_variables(
        jax.random.PRNGKey(2),
        {"image": image, "text": text, "key_padding_mask": kpm})

    method_state = method.eval_method_state()  # the export CLI's accessor
    trans = method_state["trans"]
    path = str(tmp_path / "twdh.cmh")
    export_encoders(method, variables, path, max_words=W,
                    method_state=method_state)
    enc = load_encoders(path)

    # guard rails: a TwDH export without trans must fail loudly, not ship
    # long-code-only encoders
    import pytest
    with pytest.raises(ValueError, match="trans"):
        export_encoders(method, variables, str(tmp_path / "bad.cmh"),
                        max_words=W)
    no_trans = TwDHMethod(method.module, method.loss, cfg_model,
                          train_num=32, long_center=method._long_center,
                          short_centers=method._short_centers, trans={})
    with pytest.raises(ValueError, match="short-code"):
        no_trans.eval_method_state()

    for B, seed in ((2, 5), (4, 6)):
        image, text, kpm = _rand_batch(method, B, W, seed)
        want_i, want_t = _live_codes(method, variables, image, text, kpm,
                                     trans=trans)
        got_i = enc.encode_image(image)
        got_t = enc.encode_text(text, kpm)
        # structure: (long, {"8": short8, "16": short16})
        long_i, shorts_i = got_i
        assert long_i.shape == (B, 32)
        assert sorted(shorts_i.keys()) == ["16", "8"]
        assert shorts_i["8"].shape == (B, 8)
        for got_leaf, want_leaf in zip(
                jax.tree_util.tree_leaves(got_i) + jax.tree_util.tree_leaves(got_t),
                jax.tree_util.tree_leaves(want_i) + jax.tree_util.tree_leaves(want_t)):
            np.testing.assert_array_equal(got_leaf, np.asarray(want_leaf))


@pytest.mark.slow
def test_export_cli_end_to_end(tmp_path):
    """python -m cmh_tpu.export drives the full CLI surface: config →
    method → weights msgpack → serialized artifact, loadable without model
    code. Covers the eval_method_state() accessor on a trans-less method
    (DCMHT → method_state=None)."""
    import os
    import subprocess
    import sys

    from util_methods import tiny_trainer

    tr = tiny_trainer(tmp_path / "run", "DCMHT", "DCMHTTrainer",
                      model_extra={"hash_func": "softmax"})
    tr.save_model(str(tmp_path / "run"), epoch=0)
    model_file = [f for f in os.listdir(tmp_path / "run")
                  if f.startswith("model-")][0]

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        """
model: {arch: DCMHT, clip_path: /nonexistent.pt, clip_variant: tiny, hash_func: softmax}
optimizer: {arch: BertAdam}
dataset: {arch: synthetic_dataset, name: synthetic, num_classes: 4, image_resolution: 32, max_word: 12}
run: {arch: DCMHTTrainer, output_dim: 8, train_num: 32, query_num: 16}
"""
    )
    out = str(tmp_path / "enc.cmh")
    env = dict(os.environ, CMH_TPU_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-m", "cmh_tpu.export", "--config-file", str(cfg),
         "--model", str(tmp_path / "run" / model_file), "--out", out,
         "--batch", "4"],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "exported encoders to" in proc.stdout

    from cmh_tpu.export import load_encoders as _load

    enc = _load(out)
    res = tr.method.clip_cfg.image_resolution
    rng = np.random.RandomState(3)
    image = rng.randn(4, res, res, 3).astype(np.float32)
    codes = enc.encode_image(image)
    assert codes.shape == (4, 8)
    assert set(np.unique(codes)) <= {-1.0, 1.0}
    # exported weights are the trainer's: codes match the live eval path
    want = np.asarray(tr.method.make_hash_code(tr.method.module.apply(
        {"params": tr.state.params, **tr.state.model_state},
        jnp.asarray(image), train=False,
        method=lambda m, x, train: m.encode_image(x, train=train))))
    np.testing.assert_array_equal(codes, want)
