"""ModifiedResNet tower: golden parity vs the torch reference at tiny size."""

import importlib.util

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cmh_tpu.models.clip.loader import (
    resnet_config_from_state_dict,
    resnet_variables_from_state_dict,
)
from cmh_tpu.models.clip.resnet import ModifiedResNet


@pytest.fixture(scope="module")
def pair():
    spec = importlib.util.spec_from_file_location(
        "ref_clip_model", "/root/reference/models/CLIP/model.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(0)
    tm = mod.ModifiedResNet(
        layers=(1, 1, 1, 1), output_dim=16, heads=2, input_resolution=32,
        width=8,
    ).float().eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in tm.state_dict().items()
          if "num_batches_tracked" not in k}
    cfg = resnet_config_from_state_dict(sd)
    assert cfg["layers"] == (1, 1, 1, 1)
    assert cfg["width"] == 8 and cfg["output_dim"] == 16
    module = ModifiedResNet(
        layers=cfg["layers"], output_dim=cfg["output_dim"],
        heads=2,  # tiny width: heads not inferable from width*32//64 rule
        input_resolution=cfg["input_resolution"], width=cfg["width"],
    )
    variables = resnet_variables_from_state_dict(sd, cfg["layers"])
    return tm, module, variables


def test_resnet_forward_parity(pair):
    tm, module, variables = pair
    rng = np.random.RandomState(0)
    img = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(img.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(module.apply(variables, jnp.asarray(img), train=False))
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_resnet_shapes_random_init(pair):
    _, module, variables = pair
    out = module.apply(variables, jnp.zeros((3, 32, 32, 3)), train=False)
    assert out.shape == (3, 16)
