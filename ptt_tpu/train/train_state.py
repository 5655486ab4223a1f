"""Train state + the sharded train step.

TPU-first replacement for the reference's torch training machinery: instead of DDP
process groups + NCCL all-reduce (which the reference wires up but never enables —
train_tracking.py:63 hardcodes ``dist_train = False``), the train step is one jitted
function over a ``jax.sharding.Mesh``: the batch is sharded along the 'data' axis,
parameters are replicated, and XLA inserts the gradient all-reduce over ICI.
BatchNorm statistics reduce over the *global* batch inside the same program, so
SyncBatchNorm falls out for free.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nn.losses import compute_losses


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def create_train_state(model, tx, sample_batch, rng=None, params=None,
                       batch_stats=None):
    """``params``/``batch_stats`` override the fresh init (e.g. weights converted
    from a reference torch checkpoint, utils/torch_converter.py)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = jax.jit(lambda b: model.init(rng, b, train=False))(sample_batch)
    params = variables["params"] if params is None else params
    if batch_stats is None:
        batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def _cast_floats(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def make_train_step(model_cfg, with_bn_momentum: bool = False,
                    mixed_precision: bool = False):
    """Returns train_step(state, batch) -> (state, metrics). Jittable; works
    single-device or under a mesh via sharded inputs.

    With ``with_bn_momentum`` the step takes a third scalar argument — the
    scheduled flax BN momentum — and applies the EMA correction (bn_momentum.py)
    INSIDE the compiled program, where the pre-update stats are already live in
    HBM. The trainer previously copied the whole batch_stats tree on host every
    iteration to redo the blend afterwards; in-step it costs one fused
    elementwise pass and no host sync. The momentum is a traced scalar, so the
    per-epoch schedule never recompiles.

    ``mixed_precision`` is the tpu analog of the reference's fp16
    FastAIMixedOptim (fastai_optim.py:235-262): master parameters and optimizer
    state stay float32; the forward/backward runs in bfloat16 (params and batch
    cast inside the differentiated function, so the MXU sees bf16 matmuls and the
    gradient of the cast accumulates back into float32). bf16 shares float32's
    exponent range, so the reference's loss_scale machinery is unnecessary.
    Losses and BN running stats are computed in float32."""

    def _step(state: TrainState, batch, bn_flax_momentum=None):
        def loss_fn(params):
            if mixed_precision:
                apply_params = _cast_floats(params, jnp.bfloat16)
                apply_batch = _cast_floats(batch, jnp.bfloat16)
            else:
                apply_params, apply_batch = params, batch
            out, mutated = state.apply_fn(
                {"params": apply_params, "batch_stats": state.batch_stats},
                apply_batch,
                train=True,
                mutable=["batch_stats"],
            )
            if mixed_precision:
                out = _cast_floats(out, jnp.float32)
                mutated = _cast_floats(mutated, jnp.float32)
            loss, tb = compute_losses(model_cfg, out, batch)
            return loss, (tb, mutated["batch_stats"])

        (loss, (tb, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if bn_flax_momentum is not None:
            from .bn_momentum import MODEL_BN_MOMENTUM as m0

            mt = jnp.asarray(bn_flax_momentum, jnp.float32)

            def fix(old, new):
                obs = (new - m0 * old) / (1.0 - m0)
                return mt * old + (1.0 - mt) * obs

            new_stats = jax.tree_util.tree_map(fix, state.batch_stats, new_stats)
        new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        metrics = dict(tb)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if with_bn_momentum:
        return _step
    return lambda state, batch: _step(state, batch)


def make_data_mesh(devices=None, axis: str = "data"):
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.array(devices), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a numpy batch onto the mesh, sharded along the batch dim.

    Single-host: ``batch`` is the global batch, device_put splits it.
    Multi-host: each process holds only ITS shard of every global batch (the
    loader's num_shards/shard_id), and the global array is assembled from the
    per-process pieces — the jax-native replacement for DistributedSampler + DDP.
    """
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
    from jax.experimental import multihost_utils  # noqa: F401  (doc pointer)

    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch
    )


def make_sharded_train_step(model_cfg, mesh: Mesh, axis: str = "data",
                            with_bn_momentum: bool = False,
                            mixed_precision: bool = False):
    """Jit the train step with explicit shardings: state replicated, batch sharded.
    XLA turns the batch-axis reductions (loss mean, BN stats) and the gradient
    averaging into ICI collectives."""
    from ..ops import mesh_ctx

    train_step = make_train_step(
        model_cfg, with_bn_momentum=with_bn_momentum, mixed_precision=mixed_precision
    )
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(axis))
    in_shardings = (replicated, batch_sharded) + ((replicated,) if with_bn_momentum else ())
    jitted = jax.jit(
        train_step,
        in_shardings=in_shardings,
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
    )

    def step(*args):
        # Scope the fused-kernel mesh context (ops/mesh_ctx.py) to this step's
        # trace/dispatch: the kernels shard_map over THIS mesh's batch axis
        # instead of falling back to jnp, and nothing leaks into later
        # (possibly meshless) evaluator dispatches in the same process.
        with mesh_ctx.use_mesh(mesh, axis):
            return jitted(*args)

    def lower(*args):
        # AOT surface (tools/train_bench.py cost_analysis). Must trace under the
        # same mesh context as the live dispatches, or the lowering silently
        # bakes the meshless jnp fallback and the FLOP numbers measure the
        # wrong program.
        with mesh_ctx.use_mesh(mesh, axis):
            return jitted.lower(*args)

    step.lower = lower
    return step


def make_sharded_multi_step(model_cfg, mesh: Mesh, k: int, axis: str = "data",
                            with_bn_momentum: bool = False,
                            mixed_precision: bool = False):
    """K train steps per dispatch: ``multi_step(state, stacked_batches[, bn_m])``
    scans ``make_train_step`` over batches whose leaves are stacked to
    (K, B, ...), returning (state, metrics-with-(K,)-leading-leaves).

    Why: on dispatch-latency-bound hosts (the tunnel-attached TPU measured
    ~18 ms/it between the pure device step and the dispatch-only loop,
    docs/PERFORMANCE.md training table) one dispatch carrying K steps pays that
    fixed cost once per K. Semantics are EXACTLY K sequential steps — same
    optimizer math, same per-step BN stat updates (test_train pins it); only
    the host<->device cadence changes. The reference has no analog (torch eagerly
    dispatches per op; SURVEY.md §3.1)."""
    from ..ops import mesh_ctx

    train_step = make_train_step(
        model_cfg, with_bn_momentum=with_bn_momentum, mixed_precision=mixed_precision
    )

    def multi(state, batches, *step_args):
        def body(st, one_batch):
            return train_step(st, one_batch, *step_args)

        return jax.lax.scan(body, state, batches)

    replicated = NamedSharding(mesh, P())
    stacked = NamedSharding(mesh, P(None, axis))  # (K, B, ...): shard dim 1
    in_shardings = (replicated, stacked) + ((replicated,) if with_bn_momentum else ())
    jitted = jax.jit(
        multi,
        in_shardings=in_shardings,
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
    )

    def step(*args):
        with mesh_ctx.use_mesh(mesh, axis):
            return jitted(*args)

    step.k = int(k)
    return step


def stack_shard_batches(batches, mesh: Mesh, axis: str = "data"):
    """Stack K host batches to (K, B, ...) leaves and place them with the batch
    dim (dim 1) sharded — the input format of make_sharded_multi_step."""
    import numpy as np

    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)
    sharding = NamedSharding(mesh, P(None, axis))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), stacked)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), stacked
    )
