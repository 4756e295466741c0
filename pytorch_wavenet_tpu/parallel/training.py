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


@partial(jax.jit, static_argnames=("cfg", "tx"), donate_argnums=(0, 1))
def parallel_train_step(params, opt_state, cfg: WaveNetConfig, tx, x, target):
    """Identical math to ``training.trainer.train_step``; sharding comes from
    the operands, so the same function is the 1-chip and the N-chip step."""
    loss, grads = jax.value_and_grad(cross_entropy_loss)(params, cfg, x, target)
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
