"""Hierarchical configuration system.

Equivalent capability to the reference's HDict (lib/training/hyperdict.py:3-163)
and YAML io (lib/training/config.py:1-27), redesigned:

- ``Config`` is a dot-keyed mapping with attribute access.
- ``Lazy(fn)`` values are resolved against the whole config at freeze time, so
  defaults can be derived from other keys (e.g. paths from model_name).
- ``REQUIRED`` marks keys the user must supply.
- ``override(updates)`` is strict: unknown keys raise, and a key given as a
  dotted suffix matches any config key ending with that suffix (the reference's
  inherit_from semantics, hyperdict.py:137-163).
- ``resolve()`` returns a plain nested-free SimpleNamespace snapshot, and
  ``to_dict()`` a YAML-serializable dict, persisted as all_config.yaml for
  reproducibility (reference: training.py:255-265).
"""
from __future__ import annotations

import io
from types import SimpleNamespace
from typing import Any, Callable, Dict, Iterable, Mapping

import yaml


class Lazy:
    """A deferred config value computed from the resolved config."""

    __slots__ = ("fn",)

    def __init__(self, fn: Callable[["Config"], Any]):
        self.fn = fn

    def __repr__(self) -> str:  # pragma: no cover
        return "Lazy(<fn>)"


class _Required:
    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover
        return "REQUIRED"


REQUIRED = _Required()


class ConfigError(KeyError):
    pass


class Config:
    """Flat dot-keyed config with attribute access and lazy resolution."""

    def __init__(self, **kwargs: Any):
        object.__setattr__(self, "_store", {})
        for k, v in kwargs.items():
            self._store[k] = v

    # -- mapping / attribute protocol -------------------------------------
    def __getattr__(self, key: str) -> Any:
        store = object.__getattribute__(self, "_store")
        if key in store:
            v = store[key]
            if isinstance(v, Lazy):
                v = v.fn(self)
            if v is REQUIRED:
                raise ConfigError(f"config key '{key}' is required but unset")
            return v
        raise AttributeError(key)

    def __setattr__(self, key: str, value: Any) -> None:
        self._store[key] = value

    def __getitem__(self, key: str) -> Any:
        try:
            return getattr(self, key)
        except AttributeError as e:
            raise ConfigError(key) from e

    def __setitem__(self, key: str, value: Any) -> None:
        self._store[key] = value

    def __contains__(self, key: str) -> bool:
        return key in self._store

    def keys(self) -> Iterable[str]:
        return self._store.keys()

    # -- override semantics -------------------------------------------------
    def override(self, updates: Mapping[str, Any]) -> "Config":
        """Strictly apply user updates; dotted keys suffix-match existing keys."""
        for key, value in updates.items():
            matches = self._match(key)
            if not matches:
                raise ConfigError(
                    f"unknown config key '{key}' (no existing key matches)")
            for m in matches:
                self._store[m] = value
        return self

    def _match(self, key: str) -> list:
        if key in self._store:
            return [key]
        # dotted-suffix matching: 'a.b' matches any key that equals or ends
        # with '.a.b' when keys themselves use dots; also allow suffix match
        # on the last component for convenience.
        out = [k for k in self._store if k.endswith("." + key)]
        return out

    # -- resolution ---------------------------------------------------------
    def resolve(self) -> SimpleNamespace:
        """Resolve lazies, check REQUIREDs, return an immutable-ish snapshot."""
        out = {}
        for k in self._store:
            out[k] = getattr(self, k)
        return SimpleNamespace(**out)

    def to_dict(self, resolved: bool = True) -> Dict[str, Any]:
        if resolved:
            return {k: getattr(self, k) for k in self._store}
        return dict(self._store)


# ---------------------------------------------------------------------------
# YAML io — safe load/dump with readable multiline strings.
# ---------------------------------------------------------------------------

def _str_presenter(dumper, data):
    if "\n" in data:
        return dumper.represent_scalar("tag:yaml.org,2002:str", data, style="|")
    return dumper.represent_scalar("tag:yaml.org,2002:str", data)


yaml.add_representer(str, _str_presenter, Dumper=yaml.SafeDumper)


def load_yaml(path_or_str: str, from_string: bool = False) -> Dict[str, Any]:
    if from_string:
        return yaml.safe_load(io.StringIO(path_or_str)) or {}
    with open(path_or_str) as f:
        return yaml.safe_load(f) or {}


def save_yaml(obj: Any, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(obj, f, default_flow_style=False, sort_keys=False)


def parse_cli_overrides(args: Iterable[str]) -> Dict[str, Any]:
    """Parse inline 'key: yamlvalue' CLI override snippets.

    (reference CLI grammar: lib/training/execute.py:33-52 — positional YAML
    file or model dir followed by inline YAML override snippets.)
    """
    out: Dict[str, Any] = {}
    for a in args:
        d = yaml.safe_load(io.StringIO(a))
        if not isinstance(d, dict):
            raise ValueError(f"CLI override must be 'key: value' YAML, got: {a!r}")
        out.update(d)
    return out
