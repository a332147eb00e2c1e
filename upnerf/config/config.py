"""Flat dotted-key YAML config system.

Semantics match the reference (configs/config.py:12-99):

- YAML files are flattened to a single-level dict with dotted keys
  ("nerf.N_samples").
- Every string value is ``ast.literal_eval``'d when possible, so "1e-3" and
  "[0.1, 0.5]" written as YAML strings become float / tuple
  (configs/config.py:20-27).
- Lists become tuples (hashable, jit-static friendly) (configs/config.py:26-27).
- Merging is unchecked: unknown keys are silently added
  (configs/config.py:38-43).
- CLI overrides are a flat ``key value`` remainder list, not ``--key value``
  (configs/config.py:50-53, train.py:84-89).
- ``save_yaml`` re-nests dotted keys and dumps the resolved config so that
  tto/eval can reload it later (configs/config.py:85-99, train.py:78).
"""

from __future__ import annotations

import argparse
from ast import literal_eval
from os.path import dirname, join
from typing import Any, Dict, Iterable, Optional

import yaml

DEFAULT_CONFIG_FILE = join(dirname(__file__), "default.yaml")
PRESET_DIR = join(dirname(__file__), "presets")


def resolve_preset(name: str) -> str:
    """Resolve a --preset argument: a literal yaml path, or the name of a
    packaged preset under upnerf/config/presets/ (e.g. ``best_pose``).

    Presets are measured recipe bundles (each key cites its benchmark
    artifact in the preset file) merged AFTER the scene config and BEFORE
    `key value` CLI overrides, so a scene keeps its geometry/IO keys while
    the preset retunes the training recipe — and explicit CLI overrides
    still win."""
    import os

    if os.path.isfile(name):
        return name
    path = join(PRESET_DIR, name + ".yaml")
    if os.path.isfile(path):
        return path
    avail = sorted(
        f[:-5] for f in os.listdir(PRESET_DIR) if f.endswith(".yaml")
    )
    raise FileNotFoundError(
        f"unknown preset {name!r}: not a file, and not one of {avail}"
    )


def _coerce(v: Any) -> Any:
    if isinstance(v, str):
        # YAML-style booleans first: literal_eval only knows "True"/"False",
        # so a CLI override like `tpu.fused_trunk false` would otherwise stay
        # a string — and bool("false") is True.
        if v.lower() in ("true", "false"):
            return v.lower() == "true"
        try:
            v = literal_eval(v)
        except (ValueError, SyntaxError):
            pass  # really a string
    if isinstance(v, list):
        v = tuple(v)
    return v


def flatten(d: Optional[Dict], prefix: str = "") -> Dict[str, Any]:
    """Flatten a nested dict into dotted keys, coercing values."""
    out: Dict[str, Any] = {}
    if d is None:
        return out
    for k, v in d.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix=prefix + str(k) + "."))
        else:
            out[prefix + str(k)] = _coerce(v)
    return out


def load(fname: str) -> Dict[str, Any]:
    with open(fname, "r") as fp:
        return flatten(yaml.safe_load(fp))


def merge_from_config(config: Dict[str, Any], config_merge: Dict[str, Any]) -> None:
    # Unchecked merge: new keys are added silently (configs/config.py:38-43).
    for k, v in config_merge.items():
        config[k] = v


def merge_from_file(config: Dict[str, Any], fname: str) -> None:
    merge_from_config(config, load(fname))


def merge_from_list(config: Dict[str, Any], list_merge: Iterable[str]) -> None:
    list_merge = list(list_merge)
    assert len(list_merge) % 2 == 0, "The list must have key value pairs."
    config_merge = flatten(dict(zip(list_merge[0::2], list_merge[1::2])))
    merge_from_config(config, config_merge)


def default() -> Dict[str, Any]:
    return load(DEFAULT_CONFIG_FILE)


def parse_cli(
    parser: argparse.ArgumentParser, argv: Optional[list] = None
) -> Dict[str, Any]:
    """default.yaml -> --config file -> `key value` CLI remainder -> argparse attrs.

    Mirrors reference parse_args (configs/config.py:60-74).
    """
    args = parser.parse_args(argv)
    config = default()
    config_path = getattr(args, "config", None)
    if config_path is not None:
        merge_from_file(config, config_path)
    for preset in getattr(args, "preset", None) or ():
        merge_from_file(config, resolve_preset(preset))
    opts = getattr(args, "opts", None)
    if opts:
        merge_from_list(config, opts)
    for k, v in vars(args).items():
        if k not in config:
            config[k] = v
    return config


def get_from_path(config_path: Optional[str]) -> Dict[str, Any]:
    config = default()
    if config_path is not None:
        merge_from_file(config, config_path)
    return config


def save_yaml(config: Dict[str, Any], file_name: str) -> None:
    """Re-nest dotted keys and dump (configs/config.py:85-99)."""
    nested: Dict[str, Any] = {}
    for k, v in config.items():
        keys = k.split(".")
        cur = nested
        for key in keys[:-1]:
            cur = cur.setdefault(key, {})
        if isinstance(v, tuple):
            v = list(v)
        cur[keys[-1]] = v
    with open(file_name, "w") as fp:
        yaml.safe_dump(nested, fp)
