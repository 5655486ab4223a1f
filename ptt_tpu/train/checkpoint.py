"""Checkpointing: orbax-backed save/restore with rolling retention and auto-resume.

Reference semantics reproduced (SURVEY.md §3.5):
  - ckpt payload {epoch, it, model_state, optimizer_state} (train_utils.py:160-169)
    becomes the pytree {params, batch_stats, opt_state, step, epoch};
  - rolling retention of ``max_ckpt_save_num`` newest checkpoints
    (train_utils.py:122-127) via orbax ``max_to_keep``;
  - auto-resume from the newest checkpoint in the run dir
    (train_tracking.py:149-155) via ``latest_step``;
  - shape-checked partial load for transfer/eval (tracker3d_template.py:110-122):
    ``load_params_from_file`` keeps only leaves whose path+shape match the target and
    logs the mismatches, instead of failing.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp


def _state_payload(state, epoch: int):
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": np.asarray(epoch, np.int32),
    }


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager bound to one run directory."""

    def __init__(self, ckpt_dir, max_to_keep: int = 30):
        self.ckpt_dir = Path(ckpt_dir).resolve()
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False
            ),
        )

    def save(self, state, epoch: int):
        """Save under the epoch number (reference names ckpts checkpoint_epoch_N)."""
        self._mgr.save(
            int(epoch), args=ocp.args.StandardSave(_state_payload(state, epoch))
        )
        self._mgr.wait_until_finished()

    def latest_epoch(self):
        return self._mgr.latest_step()

    def restore(self, state, epoch: int = None):
        """Restore model+optimizer (reference load_params_with_optimizer,
        tracker3d_template.py:126). Returns (state, last_epoch)."""
        epoch = int(epoch) if epoch is not None else self._mgr.latest_step()
        if epoch is None:
            return state, 0
        target = _state_payload(state, 0)
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        restored = self._mgr.restore(epoch, args=ocp.args.StandardRestore(abstract))
        new_state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        return new_state, int(restored["epoch"])

    def close(self):
        self._mgr.close()


def save_variables(path, params, batch_stats=None, metadata=None):
    """Standalone model-only checkpoint (eval artifacts, converters). String
    metadata goes to a JSON sidecar (orbax arrays-only payloads)."""
    import json

    path = Path(path).resolve()
    payload = {"params": params, "batch_stats": batch_stats or {}}
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    ckptr.close()
    if metadata:
        with open(path.parent / (path.name + ".meta.json"), "w") as f:
            json.dump(metadata, f, indent=2)


def save_variables_npz(path, params, batch_stats=None, metadata=None):
    """Single-file model-only checkpoint (numpy .npz), for artifacts that live in
    git (committed test fixtures) where orbax's directory tree is unwieldy.

    Keys are '/'-joined tree paths under 'params/' and 'batch_stats/'; metadata
    (a flat str->str/number dict) rides along under '__meta__/<key>'.
    """
    arrays = {}
    for root_key, tree in (("params", params), ("batch_stats", batch_stats or {})):
        for key_path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            name = "/".join(str(getattr(k, "key", k)) for k in key_path)
            arrays[f"{root_key}/{name}"] = np.asarray(leaf)
    for k, v in (metadata or {}).items():
        arrays[f"__meta__/{k}"] = np.asarray(v)
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)


def load_variables_npz(path):
    """Inverse of save_variables_npz. Returns (params, batch_stats, metadata)."""
    with np.load(path, allow_pickle=False) as data:
        out = {"params": {}, "batch_stats": {}}
        meta = {}
        for full_key in data.files:
            parts = full_key.split("/")
            if parts[0] == "__meta__":
                meta["/".join(parts[1:])] = data[full_key][()]
                continue
            node = out[parts[0]]
            for p in parts[1:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp_asarray_f32_preserving(data[full_key])
    return out["params"], out["batch_stats"], meta


def jnp_asarray_f32_preserving(x):
    """np array -> jnp array keeping the stored dtype (jnp.asarray would keep it
    too, but go through numpy to avoid x64 surprises on weird hosts)."""
    import jax.numpy as jnp

    return jnp.asarray(np.asarray(x))


def resolve_checkpoint_path(path, epoch=None):
    """Resolve a user-supplied checkpoint argument to a concrete orbax tree dir.

    Accepts: a run's ``ckpt`` manager dir (picks ``epoch`` or the newest numeric
    step), a specific step dir (``.../ckpt/7``), or a standalone ``save_variables``
    dir. Mirrors the reference's newest-checkpoint glob (train_tracking.py:149-155).
    """
    path = Path(path).resolve()
    if not path.exists():
        raise FileNotFoundError(f"checkpoint path {path} does not exist")
    steps = sorted(int(p.name) for p in path.iterdir() if p.is_dir() and p.name.isdigit())
    if steps:
        step = int(epoch) if epoch is not None else steps[-1]
        path = path / str(step)
    if (path / "default").is_dir():
        path = path / "default"
    return path


def load_params_from_file(path, params, batch_stats=None, logger=None):
    """Shape-checked partial parameter load (reference tracker3d_template.py:96-122).

    Leaves present in the checkpoint with matching shape are taken; everything else
    keeps the freshly-initialized value and is logged, so transfer between config
    variants (e.g. PTT ckpt -> P2B net) works like the reference's strict=False load.
    """
    path = Path(path).resolve()
    target = {"params": params, "batch_stats": batch_stats or {}}
    ckptr = ocp.PyTreeCheckpointer()
    # Restore as plain numpy via the checkpoint's OWN tree metadata instead of a
    # bare restore(): a bare restore places arrays using the sharding file, which
    # references the SAVE-time topology — a checkpoint trained on an 8-device
    # mesh then refuses to load in a 1-device eval process. The partial-load
    # merge below neither knows nor cares about device placement.
    from etils import epath

    meta = ocp.PyTreeCheckpointHandler().metadata(epath.Path(path))
    meta_tree = meta.tree if hasattr(meta, "tree") else meta
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree
    )
    restored = ckptr.restore(path, restore_args=restore_args)
    ckptr.close()

    flat_target = dict(jax.tree_util.tree_flatten_with_path(target)[0])
    flat_restored = dict(
        jax.tree_util.tree_flatten_with_path(
            {k: restored.get(k, {}) for k in ("params", "batch_stats")}
        )[0]
    )
    emit = logger.info if logger is not None else (lambda *a: None)
    used = 0
    out = {}
    for key_path, tgt_leaf in flat_target.items():
        src = flat_restored.get(key_path)
        if src is not None and np.shape(src) == np.shape(tgt_leaf):
            out[key_path] = np.asarray(src)
            used += 1
        else:
            name = jax.tree_util.keystr(key_path)
            if src is None:
                emit(f"checkpoint miss (kept init): {name}")
            else:
                emit(
                    f"shape mismatch (kept init): {name} "
                    f"ckpt{np.shape(src)} vs model{np.shape(tgt_leaf)}"
                )
            out[key_path] = tgt_leaf
    emit(f"loaded {used}/{len(flat_target)} tensors from {path}")

    treedef = jax.tree_util.tree_structure(target)
    leaves = [out[kp] for kp, _ in jax.tree_util.tree_flatten_with_path(target)[0]]
    merged = jax.tree_util.tree_unflatten(treedef, leaves)
    return merged["params"], merged["batch_stats"]
