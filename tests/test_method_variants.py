"""Config-branch coverage: method variants not exercised by the main smokes."""

import pytest
import numpy as np

from util_methods import run_steps, tiny_trainer


def test_dimch_softmax_branch(tmp_path):
    """softmax hash doubles the model output dim (reference DIMCH.py:97-98)."""
    tr = tiny_trainer(
        tmp_path, "DIMCH", "DIMCHTrainer",
        model_extra={"hash_func": "softmax", "setDim": 4,
                     "distance": {"mode": "chamfer"},
                     "hash_pars": {"quan_alpha": 1.0}},
        output_dim=8, batch=8,
    )
    assert tr.method.output_dim == 16  # doubled
    losses = run_steps(tr, n=2)
    assert np.isfinite(losses).all()
    maps = tr.valid(epoch=0)
    assert all(0 <= m <= 1 for m in maps)


@pytest.mark.slow
def test_umoed_nonfusion_bayesian_plain_ffn(tmp_path):
    """UMoED with separate heads, plain FFN decoder, Bayesian loss
    (triplet=False) and tanh+mean hashing."""
    tr = tiny_trainer(
        tmp_path, "UMoED", "UMoEDTrainer",
        model_extra={
            "hash_func": "tanh", "merge_func": "mean", "setDim": 4,
            "MoE": False, "fusion": False, "decoder_heads": 2,
            "decoder_layers": 1, "hidden_dim": 32, "extreme": False,
            "triplet": False, "distance_mode": "cosine",
            "distance": {"mode": "pairwise"},
        },
        output_dim=8, batch=8,
    )
    losses = run_steps(tr, n=2)
    assert np.isfinite(losses).all()
    maps = tr.valid(epoch=0)
    assert all(0 <= m <= 1 for m in maps)


def test_umoed_chamfer_distance_branch(tmp_path):
    tr = tiny_trainer(
        tmp_path, "UMoED", "UMoEDTrainer",
        model_extra={
            "hash_func": "linear_subspace", "merge_func": "concatenate",
            "setDim": 8, "MoE": True, "fusion": True, "num_experts": 2,
            "slots_per_expert": 2, "decoder_heads": 2, "decoder_layers": 1,
            "hidden_dim": 32, "triplet": True,
            "distance": {"mode": "smooth_chamfer"},
        },
        output_dim=8, batch=8,
    )
    losses = run_steps(tr, n=2)
    assert np.isfinite(losses).all()


def test_dcmht_tanh_variant_rejected_by_trainer(tmp_path):
    import pytest

    with pytest.raises(AssertionError):
        tiny_trainer(tmp_path, "DCMHT", "DCMHTTrainer",
                     model_extra={"hash_func": "tanh"})
