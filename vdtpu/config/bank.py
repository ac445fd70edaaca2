"""YAML config bank with inheritance and macros.

This is the public config surface of the framework: the same model-config
names as the reference (`vd_four_flow_v1-0`, `openai_unet_2d_v1*`,
`autokl_v1`, `optimus_v1`, `clip_*_context_encoder`) resolve to plain nested
dicts. Semantics mirror `/root/reference/lib/cfg_helper.py:21-165`:

- ``super_cfg: <name>`` — inherit another entry; child ``args`` dict-updates
  (not replaces) the parent's, other keys override; ``delete_args`` removes
  inherited arg keys.
- String macros, resolved recursively inside any string value:
  ``MODEL(name)`` -> the resolved config of another model entry,
  ``SAME(dot.path)`` -> value at absolute path within the current root cfg,
  ``SEARCH(dot.path)`` -> depth-first suffix search for the path.

Unlike the reference there is no ambient process-global cfg singleton; banks
are plain objects (SURVEY.md section 5, config row).
"""
from __future__ import annotations

import copy
import os
import re
from typing import Any

import yaml

_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")
_MACRO_RE = re.compile(r"(SAME|SEARCH|MODEL|DATASET)\(([^()]*)\)")


def _dict_get_path(d: Any, path: list[str]):
    for p in path:
        d = d[p]
    return d


def _search(d: Any, path: list[str]):
    """Depth-first search for the first node whose trailing keys match path."""
    try:
        return True, _dict_get_path(d, path)
    except (KeyError, TypeError, IndexError):
        pass
    if isinstance(d, dict):
        for v in d.values():
            found, out = _search(v, path)
            if found:
                return True, out
    elif isinstance(d, list):
        for v in d:
            found, out = _search(v, path)
            if found:
                return True, out
    return False, None


class ConfigBank:
    """Loads every ``*.yaml`` in a directory into one flat name->entry table."""

    def __init__(self, config_dir: str | None = None, extra_dirs: tuple[str, ...] = ()):
        self.entries: dict[str, dict] = {}
        for d in (config_dir or _CONFIG_DIR,) + tuple(extra_dirs):
            for fname in sorted(os.listdir(d)):
                if not fname.endswith((".yaml", ".yml")):
                    continue
                with open(os.path.join(d, fname)) as f:
                    loaded = yaml.safe_load(f) or {}
                for k, v in loaded.items():
                    if k in self.entries:
                        raise ValueError(f"duplicate config name {k!r} (in {fname})")
                    self.entries[k] = v

    def _inherit(self, name: str) -> dict:
        if name not in self.entries:
            raise KeyError(f"unknown config {name!r}")
        cfg = copy.deepcopy(self.entries[name])
        parent_name = cfg.pop("super_cfg", None)
        if parent_name is None:
            return cfg
        parent = self._inherit(parent_name)
        child_args = cfg.pop("args", None)
        for k in cfg.pop("delete_args", []) or []:
            parent.get("args", {}).pop(k, None)
        parent.update(cfg)
        if child_args is not None:
            parent.setdefault("args", {})
            parent["args"].update(child_args)
        return parent

    def _resolve_macros(self, node: Any, root: Any) -> Any:
        if isinstance(node, dict):
            return {k: self._resolve_macros(v, root) for k, v in node.items()}
        if isinstance(node, list):
            return [self._resolve_macros(v, root) for v in node]
        if isinstance(node, str):
            m = _MACRO_RE.fullmatch(node.strip())
            if m:
                kind, arg = m.group(1), m.group(2).strip()
                if kind == "MODEL":
                    return self(arg)
                if kind == "SAME":
                    return self._resolve_macros(
                        _dict_get_path(root, arg.split(".")), root)
                if kind == "SEARCH":
                    found, out = _search(root, arg.split("."))
                    if not found:
                        raise KeyError(f"SEARCH({arg}) found nothing")
                    return self._resolve_macros(out, root)
                if kind == "DATASET":
                    return self(arg)
            return node
        return node

    def __call__(self, name: str) -> dict:
        cfg = self._inherit(name)
        cfg = self._resolve_macros(cfg, cfg)
        cfg.setdefault("name", name)
        return cfg


_default_bank: ConfigBank | None = None


def model_cfg_bank() -> ConfigBank:
    global _default_bank
    if _default_bank is None:
        _default_bank = ConfigBank()
    return _default_bank
