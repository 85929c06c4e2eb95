"""Full-scale (ViT-B/32) torch-checkpoint import.

Round 1 only exercised the torch→flax importer on a tiny CLIP; the real
shape-inference path (/root/reference/models/CLIP/model.py:438-489) at
ViT-B/32 scale — 49408-vocab embeddings, 12×12 towers, 224px/32px patch
grid — was never run. This builds a random full-size torch CLIP from the
reference source, imports it, checks the inferred geometry, verifies the
weight mapping numerically leaf by leaf, and golden-compares encode
outputs on one sample.
"""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch


@pytest.fixture(scope="module")
def full_torch_clip(tmp_path_factory):
    if "ftfy" not in sys.modules:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s
        sys.modules["ftfy"] = stub
    spec = importlib.util.spec_from_file_location(
        "ref_clip_model_full", "/root/reference/models/CLIP/model.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(0)
    tm = mod.CLIP(
        embed_dim=512, image_resolution=224, vision_layers=12,
        vision_width=768, vision_patch_size=32, context_length=77,
        vocab_size=49408, transformer_width=512, transformer_heads=8,
        transformer_layers=12,
    ).float().eval()
    return tm


@pytest.mark.slow
def test_full_scale_shape_inference_and_mapping(full_torch_clip):
    from cmh_tpu.models.clip.loader import infer_config, params_from_state_dict
    from cmh_tpu.models.clip.model import CLIP

    tm = full_torch_clip
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in tm.state_dict().items()}

    cfg = infer_config(sd, dtype=jnp.float32)
    assert (cfg.embed_dim, cfg.image_resolution, cfg.vision_layers,
            cfg.vision_width, cfg.vision_patch_size) == (512, 224, 12, 768, 32)
    assert (cfg.context_length, cfg.vocab_size, cfg.transformer_width,
            cfg.transformer_heads, cfg.transformer_layers) == (77, 49408, 512, 8, 12)

    params = params_from_state_dict(sd, cfg)

    # the flax init tree (via eval_shape — no compute) must match leaf for
    # leaf in structure and shape
    module = CLIP(cfg)
    img = jnp.zeros((1, 224, 224, 3), jnp.float32)
    txt = jnp.zeros((1, 77), jnp.int32)
    shapes = jax.eval_shape(
        lambda r: module.init(r, img, txt, txt == 0), jax.random.PRNGKey(0)
    )["params"]
    want_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(shapes)[0]
    }
    got_paths = {
        jax.tree_util.keystr(p): np.asarray(v).shape
        for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    assert want_paths == got_paths

    # numeric spot-checks across the mapping (transposes, conv layout,
    # packed attention) at real scale
    np.testing.assert_array_equal(
        params["visual"]["conv1"]["kernel"],
        sd["visual.conv1.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        params["token_embedding"]["embedding"],
        sd["token_embedding.weight"],
    )
    blk = params["visual"]["transformer"]["resblocks_11"]
    np.testing.assert_array_equal(
        blk["attn"]["in_proj_kernel"],
        sd["visual.transformer.resblocks.11.attn.in_proj_weight"].T,
    )
    np.testing.assert_array_equal(
        blk["c_fc"]["kernel"],
        sd["visual.transformer.resblocks.11.mlp.c_fc.weight"].T,
    )


def test_full_scale_encode_golden_parity(full_torch_clip):
    """One real forward at ViT-B/32 scale, fp32, torch vs flax import."""
    from cmh_tpu.models.clip.loader import infer_config, params_from_state_dict
    from cmh_tpu.models.clip.model import CLIP

    tm = full_torch_clip
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in tm.state_dict().items()}
    cfg = infer_config(sd, dtype=jnp.float32)
    module = CLIP(cfg)
    variables = {"params": params_from_state_dict(sd, cfg)}

    rng = np.random.RandomState(1)
    img = rng.randn(1, 224, 224, 3).astype(np.float32)
    txt = np.zeros((1, 77), dtype=np.int64)
    txt[0, 0] = 49406
    txt[0, 1:9] = rng.randint(1000, 40000, 8)
    txt[0, 9] = 49407
    kpm = txt == 0

    with torch.no_grad():
        t_img = tm.encode_image(torch.from_numpy(img).permute(0, 3, 1, 2))
        t_txt = tm.encode_text(torch.from_numpy(txt))

    prev = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        j_img, _, _ = module.apply(
            variables, jnp.asarray(img),
            method=lambda m, x: m.encode_image(x),
        )
        j_txt, _, _, _ = module.apply(
            variables, jnp.asarray(txt.astype(np.int32)), jnp.asarray(kpm),
            method=lambda m, t, k: m.encode_text(t, k),
        )
    finally:
        jax.config.update("jax_default_matmul_precision", prev)

    scale_i = np.abs(t_img.numpy()).max()
    scale_t = np.abs(t_txt.numpy()).max()
    np.testing.assert_allclose(
        np.asarray(j_img), t_img.numpy(), atol=2e-4 * scale_i
    )
    np.testing.assert_allclose(
        np.asarray(j_txt), t_txt.numpy(), atol=2e-4 * scale_t
    )
