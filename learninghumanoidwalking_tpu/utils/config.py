"""YAML-backed configuration objects with attribute access.

Behavioral parity with the reference config system
(/root/reference/envs/common/config_builder.py:7-68): a recursive dict ->
attribute object where missing attributes read as None, so env code can write
``cfg.task.goal_height`` and probe optional blocks like
``cfg.dynamics_randomization`` without try/except.
"""

from __future__ import annotations

from typing import Any

import yaml


class Configuration:
    """Recursive attribute-access view over a dict.

    Missing attributes return None instead of raising, matching the
    reference's Configuration.__getattr__ semantics
    (config_builder.py:29-31).
    """

    def __init__(self, data: dict | None = None):
        self._data: dict[str, Any] = {}
        if data:
            for key, value in data.items():
                self._data[key] = self._wrap(value)

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, dict):
            return Configuration(value)
        if isinstance(value, list):
            return [Configuration._wrap(v) for v in value]
        return value

    def __getattr__(self, name: str) -> Any:
        if name.startswith("_"):
            raise AttributeError(name)
        return self._data.get(name, None)

    def __contains__(self, name: str) -> bool:
        return name in self._data

    def __repr__(self) -> str:
        return f"Configuration({self._data!r})"

    def get(self, name: str, default: Any = None) -> Any:
        value = self._data.get(name, None)
        return default if value is None else value

    def merged(self, other: "Configuration") -> "Configuration":
        """Deep merge: other's values win; nested Configurations recurse."""
        out = Configuration()
        out._data = dict(self._data)
        for key, value in other._data.items():
            mine = out._data.get(key)
            if isinstance(mine, Configuration) and isinstance(value, Configuration):
                out._data[key] = mine.merged(value)
            else:
                out._data[key] = value
        return out

    def to_dict(self) -> dict:
        out = {}
        for key, value in self._data.items():
            if isinstance(value, Configuration):
                out[key] = value.to_dict()
            elif isinstance(value, list):
                out[key] = [v.to_dict() if isinstance(v, Configuration) else v for v in value]
            else:
                out[key] = value
        return out


def load_yaml(path: str) -> Configuration:
    """Load a YAML file into a Configuration (config_builder.py:46-68)."""
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    if not isinstance(data, dict):
        raise ValueError(f"Top-level YAML structure in {path} must be a mapping")
    return Configuration(data)
