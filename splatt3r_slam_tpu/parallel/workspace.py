"""Training workspace: config includes + dotlist merges + provenance.

Parity: `splatt3r_core/workspace.py:12-83` — OmegaConf-style config with an
`include:` list, CLI dotlist overrides, a timestamped workspace directory,
and a git-commit provenance snapshot.
"""

from __future__ import annotations

import datetime
import json
import pathlib
import subprocess

import yaml


def _set_dotted(cfg: dict, dotted: str, value):
    keys = dotted.split(".")
    d = cfg
    for k in keys[:-1]:
        d = d.setdefault(k, {})
    d[keys[-1]] = yaml.safe_load(value) if isinstance(value, str) else value


def load_config(path: str, dotlist=()) -> dict:
    """YAML with `include:` list (merged in order) + dotlist overrides."""
    path = pathlib.Path(path)
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    includes = cfg.pop("include", [])
    merged: dict = {}
    for inc in includes:
        inc_path = pathlib.Path(inc)
        if not inc_path.exists():
            inc_path = path.parent / inc
        sub = load_config(str(inc_path))
        merged = _deep_merge(merged, sub)
    merged = _deep_merge(merged, cfg)
    for item in dotlist:
        k, v = item.split("=", 1)
        _set_dotted(merged, k, v)
    return merged


def _deep_merge(a: dict, b: dict) -> dict:
    out = dict(a)
    for k, v in b.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def git_provenance(repo_dir=".") -> dict:
    """Commit hash + dirty state (workspace.py:34-56 provenance snapshot)."""
    def run(*args):
        try:
            return subprocess.run(
                ["git", *args], cwd=repo_dir, capture_output=True, text=True,
                timeout=10,
            ).stdout.strip()
        except Exception:
            return ""

    return {
        "commit": run("rev-parse", "HEAD"),
        "branch": run("rev-parse", "--abbrev-ref", "HEAD"),
        "dirty": bool(run("status", "--porcelain")),
    }


def create_workspace(root: str, name: str, config: dict) -> pathlib.Path:
    """Timestamped run dir with the resolved config + provenance dumped."""
    stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    ws = pathlib.Path(root) / f"{name}_{stamp}"
    ws.mkdir(parents=True, exist_ok=True)
    with open(ws / "config.yaml", "w") as f:
        yaml.safe_dump(config, f)
    with open(ws / "provenance.json", "w") as f:
        json.dump(git_provenance(), f, indent=2)
    return ws
