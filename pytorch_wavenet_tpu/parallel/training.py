"""Multi-chip training and generation entry points.

One jitted train step serves every mesh shape: parameters are placed with
:func:`..parallel.sharding.shard_params`, batches with ``P('data')``, and
GSPMD partitions the computation — gradient allreduce over ``data`` and the
skip/end channel collectives over ``model`` ride ICI with no explicit
communication code (SURVEY.md §2.3).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import WaveNetConfig
from ..training.trainer import cross_entropy_loss
from .mesh import DATA_AXIS
from .sharding import batch_sharding, shard_opt_state, shard_params


def make_sharded_train_state(
    cfg: WaveNetConfig, params: Any, tx: optax.GradientTransformation, mesh: Mesh
):
    """Shard params on the mesh and build matching-sharded optimizer state
    (the Adam moments take the param shardings, counters replicate —
    jit(tx.init) alone commits constants to the default device)."""
    params = shard_params(params, cfg, mesh)
    opt_state = shard_opt_state(tx.init(params), params, mesh)
    return params, opt_state


@partial(jax.jit, static_argnames=("cfg", "tx", "cond_hop", "mesh"),
         donate_argnums=(0, 1))
def parallel_train_step(params, opt_state, cfg: WaveNetConfig, tx, x, target,
                        cond=None, cond_hop=None, mesh=None):
    """Identical math to ``training.trainer.train_step``; sharding comes from
    the operands, so the same function is the 1-chip and the N-chip step.

    Pass ``mesh`` when ``cfg.trunk_kernel`` is on: the fused Pallas trunk is
    opaque to GSPMD, so it runs per-data-shard inside a partial-manual
    ``shard_map`` (models/wavenet.py) — without the mesh a multi-chip
    trunk-kernel step would force replication or fail to lower.

    ``cond``/``cond_hop``: the mel-conditioned vocoder objective, sharded
    ``P('data')`` next to the batch (put it there with
    ``jax.device_put(cond, batch_sharding(mesh))``)."""
    loss, grads = jax.value_and_grad(cross_entropy_loss)(
        params, cfg, x, target, cond, cond_hop, mesh
    )
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def put_batch(mesh: Mesh, x, target):
    sh = batch_sharding(mesh)
    return jax.device_put(jnp.asarray(x), sh), jax.device_put(jnp.asarray(target), sh)


def sharded_generate_fast(params, cfg, mesh: Mesh, key, num_samples,
                          first_samples, temperature=1.0, regularize=0.0):
    """Batched multi-stream generation with streams sharded over the data
    axis (BASELINE.json config 4; the reference is batch-1 only,
    wavenet_model.py:179). ``first_samples``: (S, num_given) with S divisible
    by the data-axis size."""
    from ..models.generate import generate_fast

    first_samples = jax.device_put(first_samples, batch_sharding(mesh))
    return generate_fast(
        params, cfg, key, num_samples, first_samples,
        temperature=temperature, regularize=regularize,
    )


def data_parallel_batch_iterator(it, mesh: Mesh):
    """Wrap a host BatchIterator, placing every batch sharded over data."""
    for x, y in it:
        yield put_batch(mesh, x, y)


def sharded_generate_fast_batched(
    params, cfg, mesh: Mesh, key, num_samples, first_samples,
    temperature: float = 1.0, regularize: float = 0.0, interpret: bool = False,
    ring_dtype=None,
):
    """Pod-scale generation: every chip runs the fused HBM-ring kernel
    (ops/pallas/gen_kernel_hbm) on its shard of the streams via shard_map —
    the production serving path for BASELINE config 4 ("256 parallel sample
    streams sharded across chips"). Streams must divide by the data-axis
    size; per-chip counts must satisfy the kernel's 128-multiple alignment
    on hardware. Each shard derives its own RNG key, so results depend on
    the mesh size at temperature > 0 (argmax rollouts do not)."""
    from functools import partial

    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops.pallas.gen_kernel_hbm import generate_fast_batched

    first_samples = jnp.atleast_2d(first_samples).astype(jnp.int32)
    n_data = mesh.shape[DATA_AXIS]
    if first_samples.shape[0] % n_data != 0:
        raise ValueError(
            f"{first_samples.shape[0]} streams not divisible by data axis "
            f"{n_data}"
        )

    def per_chip(key, prime_shard):
        shard_key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        extra = {} if ring_dtype is None else {"ring_dtype": ring_dtype}
        wav, cls = generate_fast_batched(
            params, cfg, shard_key, num_samples, prime_shard,
            temperature=temperature, regularize=regularize,
            interpret=interpret, **extra,
        )
        return wav, cls

    fn = shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        check_vma=False,
    )
    return fn(key, first_samples)


def sharded_pool_step(
    params, cfg, mesh: Mesh, key, chunk: int, state, *,
    temperature, lane_seed, lane_clock, cond=None,
    interpret: bool = False, ring_dtype=None, fuse_res: bool = False,
    stage_layers: int | None = None, head_tiles: int | None = None,
    skip_slab: bool = False, regularize: float = 0.0,
):
    """One continuous-batching pool step with the lane axis sharded over
    the data mesh axis: every chip advances its shard of the shared
    :class:`~pytorch_wavenet_tpu.ops.pallas.gen_kernel_hbm.HbmGenState`
    by ``chunk`` samples in one fused kernel call. This is the multi-chip
    backend of :class:`~pytorch_wavenet_tpu.serving.ContinuousBatcher`
    (``mesh=``): a pod serves ``n_chips x lanes_per_chip`` concurrent
    streams out of one pool.

    Because sampling noise rides the per-lane request counters
    (``lane_seed``/``lane_clock`` — both required here), a lane's rollout
    is bitwise identical no matter how many chips the pool is sharded
    over; the jax ``key`` is irrelevant to sampling on seeded lanes.
    Returns ``(cls (lanes, chunk), new_state)``.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops.pallas.gen_kernel_hbm import HbmGenState, generate_fast_batched

    n_data = mesh.shape[DATA_AXIS]
    lanes = state.cls.shape[0]
    if lanes % n_data:
        raise ValueError(f"{lanes} lanes not divisible by data axis {n_data}")

    def per_chip(ring, t, cls, temps, seeds, toffs, *cond_s):
        _, out, st = generate_fast_batched(
            params, cfg, key, chunk, None,
            temperature=temps, state=HbmGenState(ring=ring, t=t, cls=cls),
            cond=cond_s[0] if cond_s else None, return_state=True,
            lane_seed=seeds, lane_clock=toffs, interpret=interpret,
            ring_dtype=state.ring.dtype if ring_dtype is None else ring_dtype,
            fuse_res=fuse_res, stage_layers=stage_layers,
            head_tiles=head_tiles, skip_slab=skip_slab,
            regularize=regularize,
        )
        return out, st.ring, st.t, st.cls

    lane = P(DATA_AXIS)
    fn = shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(P(None, DATA_AXIS), P(), lane, lane, lane, lane)
        + ((lane,) if cond is not None else ()),
        out_specs=(lane, P(None, DATA_AXIS), P(), lane),
        check_vma=False,
    )
    args = (state.ring, state.t, state.cls,
            jnp.asarray(temperature, jnp.float32),
            jnp.asarray(lane_seed, jnp.int32),
            jnp.asarray(lane_clock, jnp.int32))
    if cond is not None:
        args += (jnp.asarray(cond, jnp.float32),)
    out, ring, t, cls = fn(*args)
    return out, HbmGenState(ring=ring, t=t, cls=cls)
