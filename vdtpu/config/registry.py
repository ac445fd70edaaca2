"""Component registry: string type names -> builder callables.

Capability parity with the reference registry
(`/root/reference/lib/model_zoo/common/get_model.py:33-100`) without its
process-global singleton + lazy-module-import machinery: builders register at
import time via the decorator and are looked up from one explicit table.
"""
from __future__ import annotations

import importlib
from typing import Any, Callable

_REGISTRY: dict[str, Callable[..., Any]] = {}

# type-name prefix -> module that registers it (lazy, so importing the
# registry does not pull every model family in).
_LAZY_MODULES = {
    "vd": "vdtpu.models.vd",
    "openai_unet": "vdtpu.models.unet",
    "autoencoderkl": "vdtpu.models.autoencoder",
    "clip": "vdtpu.models.clip",
    "optimus": "vdtpu.models.optimus",
}


def register(name: str):
    def deco(fn):
        if name in _REGISTRY and _REGISTRY[name] is not fn:
            raise ValueError(f"duplicate registry entry {name!r}")
        _REGISTRY[name] = fn
        return fn
    return deco


def get_builder(type_name: str) -> Callable[..., Any]:
    if type_name not in _REGISTRY:
        for prefix, module in _LAZY_MODULES.items():
            if type_name.startswith(prefix):
                importlib.import_module(module)
                break
    if type_name not in _REGISTRY:
        raise KeyError(f"unknown component type {type_name!r}; registered: {sorted(_REGISTRY)}")
    return _REGISTRY[type_name]


def build(cfg: dict, **overrides):
    """Instantiate a component from a resolved config dict ({type, args})."""
    args = dict(cfg.get("args") or {})
    args.update(overrides)
    return get_builder(cfg["type"])(**args)
