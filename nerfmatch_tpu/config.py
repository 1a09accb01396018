"""Config system: YAML + ``inherit`` + ``#scene``/``#split`` wildcards + CLI merge.

Mirrors the reference config surface (``nerfmatch/utils/config.py:26-95``):
``load_yaml_config`` (with parent-config inclusion through an ``inherit`` key),
``dict2namespace``/``namespace2dict``, dict-union ``merge_configs``,
key-restricted ``update_configs`` and ``save_config``.  Additionally hosts the
wildcard path substitution (``#scene`` / ``#split``) that the reference
scatters across its data loaders (``data_loaders.py:39-43``).
"""

from __future__ import annotations

from argparse import Namespace
from pathlib import Path
import yaml


def dict2namespace(data_dict: dict) -> Namespace:
    """Recursively convert a dict into nested ``argparse.Namespace`` objects."""
    ns = Namespace(**data_dict)
    for key, val in vars(ns).items():
        if isinstance(val, dict):
            setattr(ns, key, dict2namespace(val))
    return ns


def namespace2dict(ns: Namespace) -> dict:
    """Recursively convert nested namespaces back into plain dicts."""
    out = {}
    for key, val in vars(ns).items():
        out[key] = namespace2dict(val) if isinstance(val, Namespace) else val
    return out


def config_as_dict(conf) -> dict:
    if isinstance(conf, dict):
        return conf
    if isinstance(conf, Namespace):
        return vars(conf)
    raise TypeError(f"Unsupported config type: {type(conf)}")


def config_as_namespace(conf) -> Namespace:
    if isinstance(conf, Namespace):
        return conf
    if isinstance(conf, dict):
        return Namespace(**conf)
    raise TypeError(f"Unsupported config type: {type(conf)}")


def merge_configs(old_conf, new_conf) -> Namespace:
    """Dict-union merge; keys in ``new_conf`` win."""
    return Namespace(**{**config_as_dict(old_conf), **config_as_dict(new_conf)})


def update_configs(old_conf, new_conf) -> Namespace:
    """Update only keys that already exist in ``old_conf``."""
    old = dict(config_as_dict(old_conf))
    new = config_as_dict(new_conf)
    for key in old:
        if key in new:
            old[key] = new[key]
    return Namespace(**old)


def load_yaml_config(cfg_path):
    """Load a YAML config; supports an ``inherit: {path: ..., key: ...}`` entry
    that splices a parent YAML (child keys win)."""
    cfg_path = Path(cfg_path)
    with open(cfg_path, "r") as f:
        config = yaml.safe_load(f)

    if "inherit" in config:
        inherit = config.pop("inherit")
        parent_path = cfg_path.parent / inherit["path"]
        with open(parent_path, "r") as f:
            parent = yaml.safe_load(f)
        if "key" in inherit:
            parent = parent[inherit["key"]]
        config = {**parent, **config}
    return dict2namespace(config), config


def save_config(cfg_path, cfg_dict) -> None:
    if isinstance(cfg_dict, Namespace):
        cfg_dict = namespace2dict(cfg_dict)
    with open(cfg_path, "w") as f:
        yaml.dump(cfg_dict, f)


def resolve_wildcards(path: str, scene: str | None = None, split: str | None = None) -> str:
    """Substitute ``#scene`` / ``#split`` wildcards in a path template."""
    if scene is not None:
        path = path.replace("#scene", scene)
    if split is not None:
        path = path.replace("#split", split)
    return path


def config2pretty_str(config) -> str:
    return yaml.dump(
        namespace2dict(config) if isinstance(config, Namespace) else config,
        sort_keys=False,
    )
