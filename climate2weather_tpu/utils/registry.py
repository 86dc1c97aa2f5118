"""Name-based dependency injection for the config system.

Parity: the reference's ``util.construct_class_by_name`` /
``call_func_by_name`` / ``get_obj_by_name`` (util.py:56-127), which let YAML
configs and CLIs name every pluggable component (dataset, network, optimizer,
noise process, EMA, LR schedule) as a dotted string.

Unlike the reference's import-path reflection, we first consult an explicit
registry (so framework-internal short names like ``"score_unet"`` work and
the wiring is greppable), and fall back to dotted-path import for user
extensions.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Any] = {}


def register(name: str) -> Callable[[Any], Any]:
    """Decorator: register a class or function under a short name."""

    def deco(obj: Any) -> Any:
        if name in _REGISTRY and _REGISTRY[name] is not obj:
            raise ValueError(f"Duplicate registry entry: {name!r}")
        _REGISTRY[name] = obj
        return obj

    return deco


def registered_names() -> list:
    return sorted(_REGISTRY)


def get_obj_by_name(name: str) -> Any:
    """Resolve ``name`` from the registry, else as ``module.path:attr`` or
    ``module.path.attr`` via import."""
    if name in _REGISTRY:
        return _REGISTRY[name]

    if ":" in name:
        mod_name, attr = name.split(":", 1)
        return getattr(importlib.import_module(mod_name), attr)

    parts = name.split(".")
    for split in range(len(parts) - 1, 0, -1):
        mod_name = ".".join(parts[:split])
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            continue
        obj = mod
        try:
            for attr in parts[split:]:
                obj = getattr(obj, attr)
        except AttributeError:
            continue
        return obj
    raise ImportError(f"Cannot resolve object by name: {name!r}")


def construct_class_by_name(*args, class_name: str, **kwargs) -> Any:
    """Instantiate the class registered/importable as ``class_name``."""
    cls = get_obj_by_name(class_name)
    return cls(*args, **kwargs)


def call_func_by_name(*args, func_name: str, **kwargs) -> Any:
    """Call the function registered/importable as ``func_name``."""
    fn = get_obj_by_name(func_name)
    return fn(*args, **kwargs)
