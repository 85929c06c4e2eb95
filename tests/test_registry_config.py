import os

import pytest

from cmh_tpu.config import ConfigNode, config_from_dict, load_config
from cmh_tpu.registry import Registry


def test_registry_register_and_lookup():
    reg = Registry()

    @reg.register_model("Foo")
    class Foo:
        pass

    assert reg.get_model_class("Foo") is Foo
    assert reg.get_model_class("missing") is None
    assert reg.list_models() == ["Foo"]


def test_registry_require_lookup():
    reg = Registry()

    @reg.register_model("Foo")
    class Foo:
        pass

    assert reg.require_model_class("Foo") is Foo
    with pytest.raises(KeyError, match="unknown model arch 'Bar'.*Foo"):
        reg.require_model_class("Bar")
    with pytest.raises(KeyError, match="unknown runner arch .*<none>"):
        reg.require_runner_class("NopeTrainer")


def test_registry_duplicate_raises():
    reg = Registry()
    reg.register_runner("R")(object)
    with pytest.raises(KeyError):
        reg.register_runner("R")(object)


def test_registry_state_store_dotted_paths():
    reg = Registry()
    reg.register("a.b.c", 42)
    assert reg.get("a.b.c") == 42
    assert reg.get("a.b.missing", default="d") == "d"
    assert reg.get("a.missing.c", default=None) is None
    reg.register_path("root", "/tmp")
    assert reg.get_path("root") == "/tmp"
    with pytest.raises(KeyError):
        reg.register_path("root", "/other")


def test_confignode_access_patterns():
    cfg = config_from_dict({"model": {"arch": "DCMHT", "nested": {"x": 1}}})
    assert cfg.model.arch == "DCMHT"
    assert cfg["model"]["arch"] == "DCMHT"
    assert cfg.model.get("missing", 7) == 7
    assert cfg.model.nested.x == 1
    cfg.run.update({"save_dir": "/tmp/x"})
    assert cfg.run.save_dir == "/tmp/x"
    assert "optimizer" in cfg  # auto-created section
    d = cfg.to_dict()
    assert d["model"]["nested"] == {"x": 1}


def test_load_config_yaml(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("model:\n  arch: MITH\nrun:\n  epochs: 3\n")
    cfg = load_config(str(p))
    assert cfg.model.arch == "MITH"
    assert cfg.run.epochs == 3
    assert isinstance(cfg.dataset, ConfigNode)
