"""Config system: YAML group composition with dotted CLI overrides.

Hydra-equivalent semantics without the dependency (the reference composes
config/defaults.yaml + group files + `# @package _global_` experiment overlays +
CLI dotted overrides, SURVEY.md §2.8).  Composition order:

    defaults.yaml -> group selections (data_module/engine/model/loss/
    lr_scheduler/optimizer/metric) -> experiment overlay -> CLI overrides

Interpolations: `${path.to.key}` resolves against the merged tree after
composition (the reference uses OmegaConf interpolation, e.g. model.img_size:
${patch_size}).
"""

from __future__ import annotations

import copy
import os
import os.path as osp
import re
from typing import Any, List, Optional

import yaml

CONFIG_DIR = osp.dirname(__file__)

GROUPS = ["data_module", "engine", "model", "loss", "lr_scheduler",
          "optimizer", "metric"]


def _deep_merge(base: dict, overlay: dict) -> dict:
    out = copy.deepcopy(base)
    for k, v in overlay.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _parse_value(s: str) -> Any:
    v = yaml.safe_load(s)
    # YAML 1.1 parses "1e-5" as a string (needs "1.0e-5"); accept it as float
    if isinstance(v, str):
        try:
            return float(v)
        except ValueError:
            return v
    return v


def _set_dotted(cfg: dict, dotted: str, value: Any):
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _get_dotted(cfg: dict, dotted: str) -> Any:
    node = cfg
    for k in dotted.split("."):
        node = node[k]
    return node


_INTERP = re.compile(r"^\$\{([a-zA-Z0-9_.]+)\}$")
_INTERP_PART = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


def _resolve(cfg: dict, node: Any) -> Any:
    if isinstance(node, dict):
        return {k: _resolve(cfg, v) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve(cfg, v) for v in node]
    if isinstance(node, str):
        m = _INTERP.fullmatch(node)
        if m:  # full-value interpolation keeps the referenced type
            return _resolve(cfg, _get_dotted(cfg, m.group(1)))
        if _INTERP_PART.search(node):  # string interpolation
            return _INTERP_PART.sub(
                lambda mm: str(_resolve(cfg, _get_dotted(cfg, mm.group(1)))),
                node,
            )
    return node


def _load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def load_config(overrides: Optional[List[str]] = None,
                config_dir: str = CONFIG_DIR) -> dict:
    """Compose the full config tree.

    overrides: hydra-style tokens, e.g.
      ["experiment=sr/grl_small_x4", "model=grl/grl_tiny", "tag=run1",
       "trainer.max_steps=1000"]
    Group selections use `group=name`; everything else is a dotted value set.
    """
    cfg = _load_yaml(osp.join(config_dir, "defaults.yaml"))
    selections = dict(cfg.pop("defaults", {}))
    experiment = None
    value_overrides = []

    for tok in overrides or []:
        key, _, value = tok.partition("=")
        if key == "experiment":
            experiment = value
        elif key in GROUPS:
            selections[key] = value
        else:
            value_overrides.append((key, _parse_value(value)))

    def _apply_group(cfg, group, name):
        """Selecting a group REPLACES its subtree (hydra override semantics) —
        deep-merging would leak keys from the previously selected file (e.g.
        sr's `scale` into the dn data module)."""
        overlay = _load_yaml(osp.join(config_dir, group, f"{name}.yaml"))
        for key in overlay:
            cfg.pop(key, None)
        return _deep_merge(cfg, overlay)

    for group, name in selections.items():
        if name is None:
            continue
        cfg = _apply_group(cfg, group, name)

    if experiment:
        path = osp.join(config_dir, "experiment", f"{experiment}.yaml")
        overlay = _load_yaml(path)
        # experiment overlays may themselves select groups via `defaults`
        for group, name in dict(overlay.pop("defaults", {})).items():
            cfg = _apply_group(cfg, group, name)
        cfg = _deep_merge(cfg, overlay)

    for key, value in value_overrides:
        _set_dotted(cfg, key, value)

    return _resolve(cfg, cfg)


class ConfigView:
    """Attribute access over the nested dict (cfg.model.embed_dim)."""

    def __init__(self, data: dict):
        self._data = data

    def __getattr__(self, k):
        try:
            v = self._data[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return ConfigView(v) if isinstance(v, dict) else v

    def __getitem__(self, k):
        v = self._data[k]
        return ConfigView(v) if isinstance(v, dict) else v

    def get(self, k, default=None):
        v = self._data.get(k, default)
        return ConfigView(v) if isinstance(v, dict) else v

    def to_dict(self):
        return self._data

    def __contains__(self, k):
        return k in self._data

    def __repr__(self):
        return f"ConfigView({self._data})"
