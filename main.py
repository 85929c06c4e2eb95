"""CLI entry point.

Surface-compatible with the reference (/root/reference/main.py:24-53 and
utils/get_args.py:3-17):

    python main.py --config-file configs/DCMHT/config.yaml --save-dir result/x

The save dir is timestamped, the YAML is loaded into the config tree, and
the runner named by ``run.arch`` is dispatched from the registry.
``--distribute`` on TPU does not spawn processes — JAX is single-program
multi-device; it asserts a mesh over the available devices instead (the
reference spawns one process per GPU with NCCL, main.py:38-51).
"""

from __future__ import annotations

import argparse
import datetime
import os


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", type=str,
                        default="configs/DCMHT/config.yaml",
                        help="choices a hash model to run.")
    parser.add_argument("--save-dir", type=str, default="./result/DCMHT",
                        help="save dir.")
    parser.add_argument("--device", type=str, default="0",
                        help="device index (informational on TPU).")
    parser.add_argument("--seed", type=int, default=None,
                        help="override run.seed from the YAML (default 1814)")
    parser.add_argument("--distribute", action="store_true", default=False,
                        help="shard training over all visible TPU devices")
    return parser.parse_args()


def read_config(config_file: str, args):
    from cmh_tpu.config import load_config

    cfg = load_config(config_file)
    cfg.run.update({"save_dir": args.save_dir})
    # the reference parses --seed but silently drops it (utils/get_args.py:11,
    # set_seed call commented out in its main.py:33) — honor it here
    if args.seed is not None:
        cfg.run.update({"seed": args.seed})
    return cfg


def maybe_init_distributed(cfg):
    """Multi-host (multi-slice / DCN) rendezvous — the TPU-native analogue of
    the reference's MASTER_ADDR/PORT + init_process_group
    (/root/reference/runners/base.py:82-96). Single-host runs skip this
    entirely. Split out of main() so the argument plumbing is unit-testable
    with a mocked ``jax.distributed.initialize`` (a typo here would otherwise
    only surface on a real multi-host pod); the real rendezvous is exercised
    by a 2-process CPU run in tests/test_parallel.py."""
    if not cfg.run.get("multi_host", False):
        return False
    import jax

    # cross-process collectives on the CPU backend need gloo (TPU pods ride
    # ICI/DCN natively). Set unconditionally — the option only affects the
    # CPU backend, and gating on jax_platforms == "cpu" missed hosts where
    # the backend merely RESOLVES to cpu (no config/env set) or where the
    # value is a list like "cpu,tpu".
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception as e:
        print(f"warning: could not enable gloo CPU collectives "
              f"({type(e).__name__}: {e}) — multi-host CPU runs may hang",
              flush=True)
    jax.distributed.initialize(
        coordinator_address="{}:{}".format(
            cfg.run.get("distributed_addr", "localhost"),
            cfg.run.get("distributed_port", 12345),
        ),
        num_processes=cfg.run.get("num_processes", None),
        process_id=cfg.run.get("process_id", None),
    )
    return True


def main():
    args = get_args()
    stamp = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M")
    args.save_dir = os.path.join(args.save_dir, stamp)
    log_dir = os.path.join(args.save_dir, "log")
    os.makedirs(log_dir, exist_ok=True)

    cfg = read_config(args.config_file, args)
    cfg.run.update({"log_dir": log_dir})

    import jax

    from cmh_tpu.registry import registry

    # cold remote-TPU compiles of the training programs take 10-25 min;
    # the repo-local persistent cache makes them one-time per machine
    from cmh_tpu.utils.jax_setup import apply_platform_escape, \
        enable_persistent_cache

    apply_platform_escape()
    enable_persistent_cache()

    maybe_init_distributed(cfg)

    world_size = jax.device_count()
    if args.distribute:
        assert world_size > 1, "distribute training needs more than one device!"
        cfg.run.update({"distribute": True})

    runner_cls = registry.require_runner_class(cfg.run.get("arch", "DCMHTTrainer"))
    runner_cls.from_config(
        cfg=cfg, world_size=world_size, distributed=args.distribute
    )


if __name__ == "__main__":
    main()
