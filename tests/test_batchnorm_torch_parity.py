"""BatchNorm1d must match torch exactly: biased variance for the batch
normalization, UNBIASED (n/(n-1)) variance for the running-stat update.
flax's nn.BatchNorm uses the biased estimate for both — the E2E parity
harness caught the eval-time drift; this pins the semantics at unit level."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from cmh_tpu.models.common import BatchNorm1d


def test_batchnorm_running_stats_match_torch():
    rng = np.random.RandomState(0)
    n, f = 25, 8
    tbn = torch.nn.BatchNorm1d(f, eps=1e-5, momentum=0.1).train()
    module = BatchNorm1d(f)
    x0 = rng.randn(n, f).astype(np.float32)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x0))
    params, stats = variables["params"], variables["batch_stats"]

    # several train steps with different batches
    for i in range(4):
        x = rng.randn(n, f).astype(np.float32) * (i + 1) + i
        with torch.no_grad():
            t_out = tbn(torch.tensor(x))
        j_out, updates = module.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x), train=True, mutable=["batch_stats"],
        )
        stats = updates["batch_stats"]
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                                   atol=1e-5)

    np.testing.assert_allclose(
        np.asarray(stats["bn"]["mean"]), tbn.running_mean.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(stats["bn"]["var"]), tbn.running_var.numpy(), rtol=1e-6
    )

    # eval mode uses the running stats
    x = rng.randn(n, f).astype(np.float32)
    tbn.eval()
    with torch.no_grad():
        t_out = tbn(torch.tensor(x))
    j_out = module.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=1e-5)
