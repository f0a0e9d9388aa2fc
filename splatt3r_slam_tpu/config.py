"""YAML config system: `inherit:` chains, deep merge, global config dict.

Spec: reference `splatt3r_slam/config.py:7-54` (same YAML schema, so the
reference's config files remain drop-in usable). PyYAML's 1.1 loader parses
scientific-notation floats like ``1e-3`` as strings; we install the standard
extended float resolver, matching the reference's regex resolver.
"""

from __future__ import annotations

import pathlib
import re

import yaml

_loader = yaml.SafeLoader
_loader.add_implicit_resolver(
    "tag:yaml.org,2002:float",
    re.compile(
        """^(?:
     [-+]?(?:[0-9][0-9_]*)\\.[0-9_]*(?:[eE][-+]?[0-9]+)?
    |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
    |\\.[0-9_]+(?:[eE][-+][0-9]+)?
    |[-+]?[0-9][0-9_]*(?::[0-5]?[0-9])+\\.[0-9_]*
    |[-+]?\\.(?:inf|Inf|INF)
    |\\.(?:nan|NaN|NAN))$""",
        re.X,
    ),
    list("-+0123456789."),
)

# Module-global config dict, re-pointed by set_global_config (config.py:48-54).
config: dict = {}


def merge_config(base: dict, child: dict) -> dict:
    """Deep merge: child values override base, dicts merge recursively."""
    out = dict(base)
    for k, v in child.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_config(out[k], v)
        else:
            out[k] = v
    return out


def load_config(path: str) -> dict:
    """Load YAML with `inherit:` parent chaining, set the global config."""
    path = pathlib.Path(path)
    with open(path) as f:
        cfg = yaml.load(f, Loader=_loader) or {}
    if "inherit" in cfg:
        parent_rel = cfg.pop("inherit")
        # inherit paths are repo-root-relative in the reference; resolve
        # against cwd, then the repo root (so configs load from any
        # cwd), then against the config file's own directory.
        parent = pathlib.Path(parent_rel)
        if not parent.exists():
            repo_root = pathlib.Path(__file__).resolve().parents[1]
            parent = repo_root / parent_rel
        if not parent.exists():
            parent = path.parent / pathlib.Path(parent_rel).name
        parent_cfg = load_config(str(parent))
        cfg = merge_config(parent_cfg, cfg)
    set_global_config(cfg)
    return cfg


def set_global_config(cfg: dict) -> None:
    """Point the module-global `config` at cfg's contents (in place)."""
    config.clear()
    config.update(cfg)
