"""Every shipped YAML parses, names a registered runner/model/dataset, and
the optimizer section carries BertAdam with the expected keys."""

import glob
import os

from cmh_tpu.config import load_config
from cmh_tpu.registry import registry

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_all_configs_parse_and_resolve():
    paths = sorted(glob.glob(os.path.join(CONFIG_ROOT, "**", "*.yaml"),
                             recursive=True))
    assert len(paths) >= 9  # 8 method configs + synthetic
    for path in paths:
        cfg = load_config(path)
        runner = cfg.run.get("arch", None)
        assert registry.get_runner_class(runner) is not None, (path, runner)
        model = cfg.model.get("arch", None)
        assert registry.get_model_class(model) is not None, (path, model)
        assert registry.get_dataset_class(cfg.dataset.get("arch")) is not None
        assert cfg.optimizer.get("arch", "BertAdam") == "BertAdam"
        # method/runner pairing matches the reference convention
        assert runner == f"{model}Trainer"


def test_method_registry_is_complete():
    expected = {"Baseline", "DCMHT", "MITH", "DSPH", "DNPH", "TwDH", "DIMCH",
                "UMoED"}
    assert expected <= set(registry.list_models())
    assert {f"{m}Trainer" for m in expected} <= set(registry.list_runners())
    assert "transformer_dataset" in registry.list_datasets()
    assert "synthetic_dataset" in registry.list_datasets()
    assert "BertAdam" in registry.list_optimizer()
    assert registry.get_tokenizer_class("clip_tokenizer") is not None
