"""Golden-value parity of the flax CLIP backbone vs the torch reference.

A tiny randomly-initialized torch CLIP (from the read-only reference mount)
is exported as a state_dict, imported through our loader, and both are run
on identical inputs in fp32. Verifies: encode_image (cls + patch tokens +
cls→patch attention), encode_text (EOS pooling + tokens + EOS attention row +
extended padding mask), and the contrastive forward.
"""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cmh_tpu.models.clip.loader import infer_config, params_from_state_dict
from cmh_tpu.models.clip.model import CLIP, CLIPConfig

EOT = 49407


@pytest.fixture(scope="module")
def ref_clip_module():
    spec = importlib.util.spec_from_file_location(
        "ref_clip_model", "/root/reference/models/CLIP/model.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def pair(ref_clip_module):
    """(torch model, our module, our params, cfg) at tiny size, fp32."""
    torch.manual_seed(0)
    tm = ref_clip_module.CLIP(
        embed_dim=32,
        image_resolution=32,
        vision_layers=2,
        vision_width=64,
        vision_patch_size=8,
        context_length=16,
        vocab_size=49408,
        transformer_width=64,
        # head count must equal width//64: checkpoint shape inference derives
        # it that way (both here and in reference model.py:456)
        transformer_heads=1,
        transformer_layers=2,
        return_patches=True,
    ).float().eval()
    sd = {k: v.detach().numpy().astype(np.float32) for k, v in tm.state_dict().items()}
    cfg = infer_config(sd, dtype=jnp.float32)
    assert cfg.vision_layers == 2 and cfg.transformer_width == 64
    module = CLIP(cfg)
    params = {"params": params_from_state_dict(sd, cfg)}
    return tm, module, params, cfg


def _inputs(cfg, batch=3, seed=1):
    rng = np.random.RandomState(seed)
    img = rng.randn(batch, cfg.image_resolution, cfg.image_resolution, 3).astype(
        np.float32
    )
    text = np.zeros((batch, cfg.context_length), dtype=np.int64)
    lengths = [5, 9, cfg.context_length]
    for i, ln in enumerate(lengths[:batch]):
        text[i, 0] = 49406
        text[i, 1 : ln - 1] = rng.randint(1000, 40000, size=ln - 2)
        text[i, ln - 1] = EOT
    kpm = text == 0
    return img, text, kpm


def test_encode_image_parity(pair):
    tm, module, params, cfg = pair
    img, _, _ = _inputs(cfg)
    with torch.no_grad():
        t_cls, t_seq, t_attn = tm.encode_image(
            torch.tensor(img.transpose(0, 3, 1, 2))
        )
    j_cls, j_seq, j_attn = module.apply(
        params, jnp.asarray(img), method=lambda m, x: m.encode_image(x)
    )
    # reference returns cls (B, D) but seq as (L-1, B, D) (model.py:263-268)
    np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(j_seq), t_seq.permute(1, 0, 2).numpy(), atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(j_attn), t_attn.numpy(), atol=2e-5)


def test_encode_text_parity(pair):
    tm, module, params, cfg = pair
    _, text, kpm = _inputs(cfg)
    with torch.no_grad():
        t_eos, t_seq, t_attn, t_kpm = tm.encode_text(
            torch.tensor(text), key_padding_mask=torch.tensor(kpm)
        )
    j_eos, j_seq, j_attn, j_kpm = module.apply(
        params,
        jnp.asarray(text.astype(np.int32)),
        jnp.asarray(kpm),
        method=lambda m, t, k: m.encode_text(t, k),
    )
    np.testing.assert_allclose(np.asarray(j_eos), t_eos.numpy(), atol=2e-4)
    # reference text seq_tokens come back (L, B, D)
    np.testing.assert_allclose(
        np.asarray(j_seq), t_seq.permute(1, 0, 2).numpy(), atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(j_attn), t_attn.numpy(), atol=2e-5)
    # torch's bool + bool via `+` is logical-or
    np.testing.assert_array_equal(np.asarray(j_kpm), t_kpm.numpy())


def test_contrastive_forward_parity(pair):
    tm, module, params, cfg = pair
    img, text, _ = _inputs(cfg)
    tm_noret = tm
    tm_noret.return_patches = False
    tm_noret.visual.return_patches = False
    with torch.no_grad():
        t_i, t_t = tm_noret(torch.tensor(img.transpose(0, 3, 1, 2)), torch.tensor(text))
    tm.return_patches = True
    tm.visual.return_patches = True
    j_i, j_t = module.apply(params, jnp.asarray(img), jnp.asarray(text.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(j_i), t_i.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(j_t), t_t.numpy(), rtol=2e-3, atol=2e-3)


def test_random_init_backbone_shapes():
    cfg = CLIPConfig.tiny()
    module = CLIP(cfg)
    variables = module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 16), jnp.int32),
    )
    cls_tok, seq, attn = module.apply(
        variables, jnp.zeros((2, 32, 32, 3)), method=lambda m, x: m.encode_image(x)
    )
    assert cls_tok.shape == (2, 32)
    assert seq.shape == (2, 16, 32)
    assert attn.shape == (2, 16)
