"""Object instantiation from config dicts.

Equivalent of Hydra's ``_target_``-driven ``instantiate`` (the reference
builds every component this way, e.g. bsi/tasks/bsi.py:105-118): a dict with
``_target_: dotted.path.Class`` becomes ``Class(**kwargs)``. Nested dicts
with ``_target_`` are instantiated first unless ``_recursive_: false``.
``name`` keys are display metadata and are not passed to constructors.
"""

from __future__ import annotations

import importlib
from typing import Any

_META_KEYS = {"_target_", "_recursive_", "name"}


def locate(dotted: str) -> Any:
    module_name, _, attr = dotted.rpartition(".")
    if not module_name:
        raise ValueError(f"_target_ {dotted!r} must be a dotted path")
    module = importlib.import_module(module_name)
    try:
        return getattr(module, attr)
    except AttributeError as e:
        raise ValueError(f"{attr!r} not found in module {module_name!r}") from e


def instantiate(cfg: Any, /, **extra: Any) -> Any:
    """Build the object described by ``cfg`` (pass-through if no ``_target_``)."""
    if not isinstance(cfg, dict) or "_target_" not in cfg:
        return cfg
    target = locate(cfg["_target_"])
    recursive = cfg.get("_recursive_", True)
    kwargs = {}
    for k, v in cfg.items():
        if k in _META_KEYS:
            continue
        if recursive and isinstance(v, dict) and "_target_" in v:
            v = instantiate(v)
        kwargs[k] = v
    kwargs.update(extra)
    return target(**kwargs)
