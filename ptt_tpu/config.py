"""YAML config system.

Mirrors the reference's public surface (``ptt/config.py``): a global ``cfg`` attribute
dict, ``cfg_from_yaml_file`` with recursive merge and ``_BASE_CONFIG_`` file
inheritance (reference: ptt/config.py:51-68), and typed dotted-path CLI overrides
``cfg_from_list`` (reference: ptt/config.py:16-48).  The reference's shipped YAML
configs (tools/cfgs/*.yaml) parse unchanged.

Implemented without the ``easydict`` dependency: ``ConfigDict`` is a plain ``dict``
subclass with attribute access, so it pickles and ``yaml.dump``s naturally.
"""

from __future__ import annotations

from ast import literal_eval
from pathlib import Path

import yaml


class ConfigDict(dict):
    """A dict with attribute access; nested dicts are converted recursively."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        if d:
            for k, v in d.items():
                self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    def __setitem__(self, key, value):
        if isinstance(value, dict) and not isinstance(value, ConfigDict):
            value = ConfigDict(value)
        elif isinstance(value, (list, tuple)):
            value = type(value)(
                ConfigDict(v) if isinstance(v, dict) and not isinstance(v, ConfigDict) else v
                for v in value
            )
        super().__setitem__(key, value)

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def copy(self):
        return ConfigDict({k: (v.copy() if isinstance(v, ConfigDict) else v) for k, v in self.items()})


def log_config_to_file(config, pre="cfg", logger=None):
    for key, val in config.items():
        if isinstance(val, ConfigDict):
            logger.info("\n%s.%s = dict()" % (pre, key))
            log_config_to_file(val, pre=pre + "." + key, logger=logger)
            continue
        logger.info("%s.%s: %s" % (pre, key, val))


def cfg_from_list(cfg_list, config):
    """Set config keys from a flat [KEY.PATH, value, ...] list (CLI ``--set``)."""
    assert len(cfg_list) % 2 == 0, "override list must be key/value pairs"
    for k, v in zip(cfg_list[0::2], cfg_list[1::2]):
        key_list = k.split(".")
        d = config
        for subkey in key_list[:-1]:
            assert subkey in d, "NotFoundKey: %s" % subkey
            d = d[subkey]
        subkey = key_list[-1]
        assert subkey in d, "NotFoundKey: %s" % subkey
        try:
            value = literal_eval(v)
        except (ValueError, SyntaxError):
            value = v

        if type(value) != type(d[subkey]) and isinstance(d[subkey], ConfigDict):
            # "k1:v1,k2:v2" updates into an existing sub-dict with per-key type coercion
            for src in value.split(","):
                cur_key, cur_val = src.split(":")
                val_type = type(d[subkey][cur_key])
                d[subkey][cur_key] = val_type(cur_val)
        elif type(value) != type(d[subkey]) and isinstance(d[subkey], list):
            val_list = list(value) if isinstance(value, tuple) else value.split(",")
            elem_type = type(d[subkey][0])
            d[subkey] = [elem_type(x) for x in val_list]
        else:
            assert type(value) == type(d[subkey]), (
                f"type {type(value)} does not match original type {type(d[subkey])} for key {k}"
            )
            d[subkey] = value
    return config


def _resolve_base_path(base_path, rel_to=None):
    """Resolve _BASE_CONFIG_ against (in order): as-given, the including file's
    directory, and the repo root — so configs work from any CWD."""
    cand = [Path(base_path)]
    if rel_to is not None:
        cand.append(Path(rel_to).parent / base_path)
    cand.append(Path(__file__).resolve().parent.parent / base_path)
    for p in cand:
        if p.exists():
            return p
    raise FileNotFoundError(f"_BASE_CONFIG_ not found: {base_path}")


def merge_new_config(config, new_config, rel_to=None):
    if "_BASE_CONFIG_" in new_config:
        base_path = _resolve_base_path(new_config["_BASE_CONFIG_"], rel_to)
        with open(base_path, "r") as f:
            base = yaml.safe_load(f)
        # recurse: the base may itself have a _BASE_CONFIG_ (chains like
        # p2b_synth -> ptt_synth -> kitti/ptt), and sections must DEEP-merge so a
        # child overriding two keys of OPTIMIZATION keeps the parent's others
        merge_new_config(config, base, rel_to=base_path)

    for key, val in new_config.items():
        if key == "_BASE_CONFIG_":
            continue
        if not isinstance(val, dict):
            config[key] = val
            continue
        if key not in config:
            config[key] = ConfigDict()
        merge_new_config(config[key], val)
    return config


def cfg_from_yaml_file(cfg_file, config=None):
    if config is None:
        config = ConfigDict()
    with open(cfg_file, "r") as f:
        new_config = yaml.safe_load(f)
    merge_new_config(config=config, new_config=new_config, rel_to=cfg_file)
    return config


cfg = ConfigDict()
cfg.ROOT_DIR = (Path(__file__).resolve().parent / "../").resolve()
cfg.LOCAL_RANK = 0
