"""Lightweight OmegaConf-compatible config tree.

The reference drives everything from OmegaConf YAML files with four sections
(``model`` / ``optimizer`` / ``dataset`` / ``run``) and reads every key with
``.get(key, default)`` plus attribute access (see /root/reference/main.py:15-22
and configs/*.yaml). omegaconf is not available in this environment, so this
module provides the small surface the framework needs: YAML load, attribute
and item access, ``.get`` with defaults, ``.update``, and nested dict wrapping.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterator, Optional

import yaml


class ConfigNode:
    """A dict wrapper with attribute access, recursive over nested dicts."""

    def __init__(self, data: Optional[Dict[str, Any]] = None) -> None:
        object.__setattr__(self, "_data", {})
        if data:
            for k, v in data.items():
                self._data[k] = self._wrap(v)

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, dict):
            return ConfigNode(value)
        if isinstance(value, (list, tuple)):
            return [ConfigNode._wrap(v) for v in value]
        return value

    # ------------------------------------------------------------- dict-like
    def get(self, key: str, default: Any = None) -> Any:
        return self._data.get(key, default)

    def update(self, other: Dict[str, Any]) -> None:
        for k, v in other.items():
            self._data[k] = self._wrap(v)

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    def values(self):
        return self._data.values()

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def __getitem__(self, key: str) -> Any:
        return self._data[key]

    def __setitem__(self, key: str, value: Any) -> None:
        self._data[key] = self._wrap(value)

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    # -------------------------------------------------------- attribute-like
    def __getattr__(self, key: str) -> Any:
        try:
            return self._data[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key: str, value: Any) -> None:
        self._data[key] = self._wrap(value)

    # ----------------------------------------------------------------- misc
    def to_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k, v in self._data.items():
            if isinstance(v, ConfigNode):
                out[k] = v.to_dict()
            elif isinstance(v, list):
                out[k] = [x.to_dict() if isinstance(x, ConfigNode) else x for x in v]
            else:
                out[k] = v
        return out

    def __repr__(self) -> str:
        return "ConfigNode({})".format(self.to_dict())


def load_config(path: str) -> ConfigNode:
    """Load a YAML config file into a ConfigNode tree."""
    assert os.path.isfile(path), f"config file {path} doesn't exist!"
    with open(path, "r") as f:
        data = yaml.safe_load(f) or {}
    cfg = ConfigNode(data)
    # every consumer expects the four top-level sections to exist
    for section in ("model", "optimizer", "dataset", "run"):
        if section not in cfg:
            cfg[section] = {}
    return cfg


class EmptyConfig:
    """A .get()-only stand-in for absent config sections."""

    def get(self, key: str, default: Any = None) -> Any:
        return default


def config_from_dict(data: Dict[str, Any]) -> ConfigNode:
    cfg = ConfigNode(data)
    for section in ("model", "optimizer", "dataset", "run"):
        if section not in cfg:
            cfg[section] = {}
    return cfg
