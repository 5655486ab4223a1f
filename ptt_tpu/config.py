"""YAML config system.

Mirrors the reference's public surface (``ptt/config.py``): a global ``cfg`` attribute
dict, ``cfg_from_yaml_file`` with recursive merge and ``_BASE_CONFIG_`` file
inheritance (reference: ptt/config.py:51-68), and typed dotted-path CLI overrides
``cfg_from_list`` (same override grammar as ptt/config.py:16-48 — scalars, comma
lists, and ``k:v`` sub-dict merges — restated here with explicit errors instead of
asserts).  The reference's shipped YAML configs (tools/cfgs/*.yaml) parse unchanged.

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


def _walk_to_parent(config, dotted_key):
    """Follow ``A.B.C`` down to the ConfigDict holding the final segment.

    Every segment must already exist — ``--set`` may only override keys the
    loaded YAML defines, never invent new ones (typo protection).
    """
    node = config
    *parents, leaf = dotted_key.split(".")
    for seg in parents:
        if seg not in node:
            raise KeyError(f"--set: no such config section {seg!r} in {dotted_key!r}")
        node = node[seg]
    if leaf not in node:
        raise KeyError(f"--set: no such config key {leaf!r} in {dotted_key!r}")
    return node, leaf


def _coerce_override(raw, old):
    """Turn the CLI string ``raw`` into a value of the same shape/type as ``old``.

    Three forms, decided by what the key currently holds:
      scalar   -> python-literal parse, type must match the existing value
      list     -> "3,4,5" or a literal tuple, elements cast to the old element type
      sub-dict -> "k1:v1,k2:v2" merges per-key with per-key type casts
    """
    try:
        value = literal_eval(raw)
    except (ValueError, SyntaxError):
        value = raw  # a bare string

    if type(value) is type(old):
        return value
    if isinstance(old, dict):
        merged = old
        for pair in value.split(","):
            k, _, v = pair.partition(":")
            merged[k] = type(old[k])(v)
        return merged
    if isinstance(old, list):
        items = list(value) if isinstance(value, tuple) else value.split(",")
        elem_t = type(old[0])
        return [elem_t(x) for x in items]
    raise TypeError(
        f"--set: cannot override a {type(old).__name__} with {raw!r} "
        f"(parsed as {type(value).__name__})"
    )


def cfg_from_list(cfg_list, config):
    """Apply CLI ``--set KEY.PATH value ...`` overrides, with type coercion toward
    the existing value's type (scalars, lists, and flat sub-dict updates)."""
    if len(cfg_list) % 2 != 0:
        raise ValueError("--set expects KEY VALUE pairs; got an odd-length list")
    for dotted, raw in zip(cfg_list[::2], cfg_list[1::2]):
        node, leaf = _walk_to_parent(config, dotted)
        node[leaf] = _coerce_override(raw, node[leaf])
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
