"""PartitionSpecs for WaveNet parameters, optimizer state, and activations.

Megatron-style channel parallelism adapted to the WaveNet head (SURVEY.md
§2.3's TPU-native replacement table):

* ``w_skip (L, D, S)`` is column-parallel on the skip axis — each chip
  produces its shard of the skip activations ``(N, T, S/model)``;
* ``end1.w (S, E)`` is row-parallel — contraction over the sharded S axis,
  XLA inserts the psum over the ``model`` axis;
* everything else (start conv, per-layer gated/residual convs: 32-channel,
  too small to shard profitably) is replicated.

Gradient allreduce over ``data`` falls out of jit's partitioning — no
hand-written collectives anywhere, per the scaling-book recipe.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import WaveNetConfig
from .mesh import DATA_AXIS, MODEL_AXIS

Params = Any


def param_pspecs(cfg: WaveNetConfig, params: Params) -> Params:
    """PartitionSpec pytree matching the params structure."""
    specs = {
        "start": {"w": P(), "b": P()},
        "layers": {
            "w_in": P(),
            "b_in": P(),
            "w_res": P(),
            "b_res": P(),
            # conditioning 1x1s: small, replicated
            "w_cond": P(),
            "w_gcond": P(),
            # skip projection: column-parallel over model axis
            "w_skip": P(None, None, MODEL_AXIS),
            "b_skip": P(None, MODEL_AXIS),
        },
        # end1: row-parallel (contracts the sharded skip axis)
        "end1": {"w": P(MODEL_AXIS, None), "b": P()},
        "end2": {"w": P(), "b": P()},
    }

    def pick(path, leaf):
        # learnable cond upsampler stages: small (2, r, M, M) banks, replicated
        if path and path[0].key == "cond_up":
            return P()
        node = specs
        for p in path:
            node = node[p.key]
        return node

    return jax.tree_util.tree_map_with_path(pick, params)


def shard_params(params: Params, cfg: WaveNetConfig, mesh: Mesh) -> Params:
    """Place parameters on the mesh according to :func:`param_pspecs`."""
    specs = param_pspecs(cfg, params)
    # copy before placement: device_put may alias the source buffer as one
    # shard, and the sharded train step donates its inputs — without the
    # copy, donation would delete the caller's arrays
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(jnp.array(x), NamedSharding(mesh, s)),
        params,
        specs,
    )


def shard_opt_state(opt_state, sharded_params: Params, mesh: Mesh):
    """Place optimizer state on the mesh: subtrees that mirror the params
    pytree (Adam's mu/nu) get the param shardings, every other leaf (step
    counters etc.) is replicated.

    Needed because neither eager ``tx.init`` nor ``jax.jit(tx.init)``
    reliably propagates input shardings into the state (jit commits
    constants like ``count`` to the default device, which then clashes with
    the mesh-placed params inside the donated train step)."""
    p_shardings = jax.tree_util.tree_map(lambda x: x.sharding, sharded_params)
    params_def = jax.tree_util.tree_structure(sharded_params)
    rep = NamedSharding(mesh, P())

    def rec(node):
        try:
            if jax.tree_util.tree_structure(node) == params_def:
                return jax.device_put(node, p_shardings)
        except Exception:
            pass
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            mapped = [rec(c) for c in node]
            if hasattr(node, "_fields"):  # NamedTuple (optax states)
                return type(node)(*mapped)
            return type(node)(mapped)
        return jax.device_put(jnp.asarray(node), rep)

    return rec(opt_state)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Training batches (and generation streams) shard over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def activation_constraint(x, mesh: Mesh):
    """Constrain trunk activations to (data-batch, replicated-time,
    model-channels) inside jit."""
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(DATA_AXIS, None, None))
    )


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
