"""YAML config system with OmegaConf-compatible access patterns.

The reference framework chains model stages through *saved config files*: each
trainer re-serialises its config next to its checkpoints and downstream stages
discover model architecture from those files (reference: ``stage1_VAE/main.py:182``,
``stage2_cINN/main.py:141``, ``stage2_cINN/AE/main.py:123``, consumed by
``get_model.py:15-19`` and ``stage2_cINN/modules/INN.py:36-41``).  We preserve
those exact section names / keys so saved configs remain chainable, but carry
them in a tiny dependency-free ``Config`` mapping (omegaconf is not available
in this environment, and we only need load / save / dot- & item-access).
"""

from __future__ import annotations

import copy
import io
import os
from typing import Any, Iterator, Mapping

import yaml


class Config(dict):
    """A dict with attribute access, recursively applied. ``cfg.Data['img_size']``
    and ``cfg.Data.img_size`` both work, mirroring OmegaConf usage in the
    reference CLIs."""

    def __init__(self, data: Mapping[str, Any] | None = None, **kw: Any):
        super().__init__()
        merged = dict(data or {})
        merged.update(kw)
        for k, v in merged.items():
            self[k] = v

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, Config):
            return value
        if isinstance(value, Mapping):
            return Config(value)
        if isinstance(value, (list, tuple)):
            return [Config._wrap(v) for v in value]
        return value

    def __setitem__(self, key: str, value: Any) -> None:
        super().__setitem__(key, Config._wrap(value))

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError:
            # OmegaConf 2.0 resolves missing keys to None in several reference
            # call sites (e.g. the Logging 'entity' lookup); mimic only for
            # attribute access so typos in item access still raise.
            raise AttributeError(key) from None

    def get(self, key: str, default: Any = None) -> Any:
        return super().get(key, default)

    def __deepcopy__(self, memo: dict) -> "Config":
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> dict:
        def unwrap(v: Any) -> Any:
            if isinstance(v, Config):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, list):
                return [unwrap(x) for x in v]
            return v

        return unwrap(self)

    def merge_from(self, other: Mapping[str, Any]) -> "Config":
        """Recursive in-place merge (other wins)."""
        for k, v in other.items():
            if k in self and isinstance(self[k], Config) and isinstance(v, Mapping):
                self[k].merge_from(v)
            else:
                self[k] = v
        return self


def load(path: str | os.PathLike | io.IOBase) -> Config:
    """OmegaConf.load equivalent."""
    if hasattr(path, "read"):
        return Config(yaml.safe_load(path.read()) or {})
    with open(path, "r") as f:
        return Config(yaml.safe_load(f) or {})


def loads(text: str) -> Config:
    return Config(yaml.safe_load(text) or {})


def save(config: Mapping[str, Any], f: str | os.PathLike | io.IOBase) -> None:
    """OmegaConf.save equivalent — writes plain YAML that the reference's
    OmegaConf (or this module) can read back."""
    data = config.to_dict() if isinstance(config, Config) else dict(config)
    text = yaml.safe_dump(data, sort_keys=False, default_flow_style=None)
    if hasattr(f, "write"):
        f.write(text)
    else:
        with open(f, "w") as fh:
            fh.write(text)


def iter_leaves(config: Mapping[str, Any], prefix: str = "") -> Iterator[tuple[str, Any]]:
    for k, v in config.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            yield from iter_leaves(v, key)
        else:
            yield key, v
