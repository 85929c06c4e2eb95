"""Shared helpers for per-method tests: tiny trainer construction."""

from cmh_tpu.config import config_from_dict
from cmh_tpu.registry import registry


def tiny_trainer(tmp_path, arch, runner, model_extra=None, optimizer_extra=None,
                 run_extra=None, num_classes=4, output_dim=8, batch=16):
    cfg = config_from_dict(
        {
            "model": dict(
                {"arch": arch, "clip_path": "/nonexistent.pt",
                 "clip_variant": "tiny"},
                **(model_extra or {}),
            ),
            "optimizer": dict(
                {"arch": "BertAdam", "lr": 0.002, "clip_lr": 0.0005,
                 "warmup_proportion": 0.1, "schedule": "warmup_cosine"},
                **(optimizer_extra or {}),
            ),
            "dataset": {"arch": "synthetic_dataset", "name": "synthetic",
                        "num_classes": num_classes, "image_resolution": 32,
                        "max_word": 12},
            "run": dict(
                {"arch": runner, "save_dir": str(tmp_path),
                 "log_dir": str(tmp_path / "log"), "output_dim": output_dim,
                 "batch_size": batch, "is_train": True, "train_num": 2 * batch,
                 "query_num": batch, "epochs": 1, "display_step": 1000,
                 "seed": 5},
                **(run_extra or {}),
            ),
        }
    )
    runner_cls = registry.get_runner_class(runner)
    assert runner_cls is not None, runner
    return runner_cls.from_config(cfg=cfg, auto_run=False)


def run_steps(trainer, n=4):
    import jax.numpy as jnp

    losses = []
    it = iter(trainer.train_loader)
    batches = list(it)
    i = 0
    while len(losses) < n:
        batch = batches[i % len(batches)]
        i += 1
        db = {k: jnp.asarray(v) for k, v in batch.items()}
        trainer.state, loss, loss_dict = trainer._train_step(trainer.state, db)
        losses.append(float(loss))
    return losses
