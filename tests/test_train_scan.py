"""Device-side multi-step training (``_train_scan``) ≡ the per-step path.

The scan path exists so N train steps cost one dispatch + one fetch (the
tunneled TPU backend pays ~40ms of relay overhead per jitted call — see
CLAUDE.md "Benchmarking traps" #3); bench.py measures through it. It must be
step-for-step the same program as ``_train_step`` or the bench would measure
a different trainer than the one that runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from util_methods import tiny_trainer


def _stack(batches, n):
    return {
        k: jnp.stack([jnp.asarray(batches[i % len(batches)][k]) for i in range(n)])
        for k in batches[0]
    }


def test_train_scan_matches_per_step(tmp_path):
    n = 4
    tr_a = tiny_trainer(tmp_path / "a", "DCMHT", "DCMHTTrainer")
    tr_b = tiny_trainer(tmp_path / "b", "DCMHT", "DCMHTTrainer")

    batches = list(iter(tr_a.train_loader))
    losses_a = []
    for i in range(n):
        db = {k: jnp.asarray(v) for k, v in batches[i % len(batches)].items()}
        tr_a.state, loss, _ = tr_a._train_step(tr_a.state, db)
        losses_a.append(float(loss))

    # same seed → same init params; feed the scan the SAME host batches
    # (both loaders draw shuffle order from the shared numpy global RNG, so
    # re-iterating tr_b's loader would yield a different batch order)
    stacked = _stack(batches, n)
    tr_b.state, (losses_b, _) = tr_b._train_scan(tr_b.state, stacked)

    np.testing.assert_allclose(
        np.asarray(losses_b), np.asarray(losses_a), rtol=1e-5, atol=1e-6
    )
    flat_a = jax.tree_util.tree_leaves(tr_a.state.params)
    flat_b = jax.tree_util.tree_leaves(tr_b.state.params)
    for pa, pb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-6)
    assert int(tr_b.state.step) == n


@pytest.mark.slow
def test_train_scan_with_method_state(tmp_path):
    """MITH carries train-set-sized memory banks in method_state — the scan
    must thread them step-to-step exactly like the per-step path."""
    n = 3
    tr_a = tiny_trainer(tmp_path / "a", "MITH", "MITHTrainer")
    tr_b = tiny_trainer(tmp_path / "b", "MITH", "MITHTrainer")

    batches = list(iter(tr_a.train_loader))
    for i in range(n):
        db = {k: jnp.asarray(v) for k, v in batches[i % len(batches)].items()}
        tr_a.state, _, _ = tr_a._train_step(tr_a.state, db)

    tr_b.state, _ = tr_b._train_scan(tr_b.state, _stack(batches, n))

    for ma, mb in zip(
        jax.tree_util.tree_leaves(tr_a.state.method_state),
        jax.tree_util.tree_leaves(tr_b.state.method_state),
    ):
        np.testing.assert_allclose(np.asarray(ma), np.asarray(mb),
                                   rtol=1e-5, atol=1e-6)


def test_scan_steps_epoch_and_eval_match_per_step(tmp_path):
    """cfg.run.scan_steps chunks train_epoch AND get_code into device-side
    scans (one dispatch per chunk on the tunneled backend). A scan_steps=3
    trainer over 5 batches (one full chunk + a ragged tail — the tail rides
    the single-step program, never a bespoke tail-length scan) must produce
    the same params and eval code buffers as the per-step trainer."""
    run = {"shuffle": False, "train_num": 80, "query_num": 16}
    tr_a = tiny_trainer(tmp_path / "a", "DCMHT", "DCMHTTrainer",
                        run_extra=dict(run))
    tr_b = tiny_trainer(tmp_path / "b", "DCMHT", "DCMHTTrainer",
                        run_extra=dict(run, scan_steps=3))
    assert tr_a.scan_steps == 1 and tr_b.scan_steps == 3
    assert len(tr_a.train_loader) == 5  # chunk of 3 + tail of 2

    tr_a.train_epoch(0)
    tr_b.train_epoch(0)
    assert tr_a.global_step == tr_b.global_step == 5

    for pa, pb in zip(jax.tree_util.tree_leaves(tr_a.state.params),
                      jax.tree_util.tree_leaves(tr_b.state.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-6)

    qa_i, qa_t = tr_a.get_code(tr_a.query_loader, tr_a.query_num)
    qb_i, qb_t = tr_b.get_code(tr_b.query_loader, tr_b.query_num)
    np.testing.assert_allclose(np.asarray(qa_i), np.asarray(qb_i),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(qa_t), np.asarray(qb_t),
                               rtol=1e-5, atol=1e-6)


def test_twdh_eval_scan_matches_per_step(tmp_path):
    """TwDH's multi-code eval (long + per-short-dim buffers) honors
    run.scan_steps through its own encode scan — previously the one eval
    path still paying a per-batch dispatch. scan_steps=3 over a 4-batch
    query loader (chunk + ragged tail) must reproduce the per-step buffers
    exactly, for every code dim."""
    model = {"hash_func": "softmax", "long_dim": 16, "short_info": [8],
             "numclass": 4, "quan_alpha": 0.5, "low_rate": 0.1}
    run = {"shuffle": False, "train_num": 32, "query_num": 64,
           "batch_size": 16}
    tr_a = tiny_trainer(tmp_path / "a", "TwDH", "TwDHTrainer",
                        model_extra=dict(model), run_extra=dict(run))
    tr_b = tiny_trainer(tmp_path / "b", "TwDH", "TwDHTrainer",
                        model_extra=dict(model),
                        run_extra=dict(run, scan_steps=3))
    assert len(tr_b.query_loader) == 4  # chunk of 3 + ragged tail of 1

    bufs_a = tr_a.get_code(tr_a.query_loader, tr_a.query_num)
    bufs_b = tr_b.get_code(tr_b.query_loader, tr_b.query_num)
    for a, b in zip(jax.tree_util.tree_leaves(bufs_a),
                    jax.tree_util.tree_leaves(bufs_b)):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_scan_steps_longer_than_epoch_whole_loader_scan(tmp_path):
    """When the loader is shorter than scan_steps (the full-scale epoch A/B
    protocol: 10 train batches at scan_steps=25), the whole epoch runs as ONE
    scan — the same compiled program every epoch — instead of per-step
    dispatches. Results must still match the per-step trainer exactly."""
    run = {"shuffle": False, "train_num": 48, "query_num": 16}
    tr_a = tiny_trainer(tmp_path / "a", "DCMHT", "DCMHTTrainer",
                        run_extra=dict(run))
    tr_b = tiny_trainer(tmp_path / "b", "DCMHT", "DCMHTTrainer",
                        run_extra=dict(run, scan_steps=8))
    assert len(tr_b.train_loader) == 3  # 3 < scan_steps → whole-epoch scan

    tr_a.train_epoch(0)
    tr_b.train_epoch(0)
    assert tr_a.global_step == tr_b.global_step == 3
    assert int(tr_b.state.step) == 3

    for pa, pb in zip(jax.tree_util.tree_leaves(tr_a.state.params),
                      jax.tree_util.tree_leaves(tr_b.state.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-6)

    qa = tr_a.get_code(tr_a.query_loader, tr_a.query_num)
    qb = tr_b.get_code(tr_b.query_loader, tr_b.query_num)
    for a, b in zip(qa, qb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
