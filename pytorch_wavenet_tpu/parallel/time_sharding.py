"""Time-axis (context) parallelism: the trunk with T sharded across chips.

SURVEY.md §5's conditional item — the convolutional analogue of context
parallelism. Each chip holds a contiguous slice of the time axis; a layer
with dilation ``d`` needs the ``(kernel_size-1)*d`` trailing columns of the
left neighbor's residual stream (the "halo") before it can compute its
first positions. The halo rides ICI as one ``lax.ppermute`` per layer
inside ``shard_map``; the leftmost shard substitutes zeros, which is
exactly the zero-history semantics of the unsharded trunk (and of the
reference's ``dilate()`` start padding, wavenet_modules.py:23-27).

Scope: forward/loss for *training over long sequences that exceed one
chip* — generation never needs this (its state is O(receptive_field) ring
buffers). The per-shard math reuses the stacked-parameter layout; weights
are replicated (they are small next to long-T activations, which are what
needs sharding).

Constraint: the shard length ``T/n`` must be at least the largest halo
``(k-1)*max_dilation`` so one neighbor hop suffices; for the chaconne
stack (halo 512) any useful long-context shard (8k+) satisfies this with
room to spare.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import WaveNetConfig
from ..models.wavenet import Params, embed_inputs, _mm
from .mesh import DATA_AXIS


def max_halo(cfg: WaveNetConfig) -> int:
    """Largest per-layer halo: (kernel_size-1) * max_dilation."""
    return (cfg.kernel_size - 1) * cfg.max_dilation


def _left_halo(h: jnp.ndarray, need: int, axis_name: str, n_shards: int):
    """The last ``need`` time columns of the left neighbor (zeros for the
    leftmost shard). One collective-permute over ICI."""
    tail = h[:, -need:, :]
    if n_shards > 1:
        perm = [(i, i + 1) for i in range(n_shards - 1)]
        tail = lax.ppermute(tail, axis_name, perm)
    idx = lax.axis_index(axis_name)
    return jnp.where(idx == 0, jnp.zeros_like(tail), tail)


def time_sharded_logits(
    params: Params,
    cfg: WaveNetConfig,
    x: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
) -> jnp.ndarray:
    """Trunk forward with the time axis sharded over ``axis_name``.

    ``x``: int ``(N, T)`` with ``T`` divisible by the axis size and
    ``T/n >= max_halo(cfg)``. Returns logits ``(N, T, classes)`` (sharded
    the same way): position t sees x[<=t] with zero history before t=0 —
    identical semantics to ``wavenet_logits(..., out_len=T)``, which the
    tests pin allclose on a virtual mesh.

    ``params`` must be replicated (host arrays are fine) — the in_spec is
    ``P()``; arrays already sharded over a model axis would be read as if
    each shard were the whole tensor.
    """
    n = mesh.shape[axis_name]
    N, T = x.shape
    if T % n:
        raise ValueError(f"T={T} not divisible by {n} time shards")
    if T // n < max_halo(cfg):
        raise ValueError(
            f"shard length {T // n} < max halo {max_halo(cfg)}; use fewer "
            "shards or longer sequences (one-hop halo exchange)"
        )
    k = cfg.kernel_size
    cdt = cfg.compute_dtype

    def per_shard(params, x_shard):
        h = embed_inputs(params, cfg, x_shard)  # (N, Tl, R)
        Tl = h.shape[1]
        lp = params["layers"]
        skip = jnp.zeros((N, Tl, cfg.skip_channels), jnp.float32)
        for l, d in enumerate(cfg.dilations):
            need = (k - 1) * d
            hx = jnp.concatenate(
                [_left_halo(h, need, axis_name, n), h], axis=1
            )  # (N, need + Tl, R)
            z = _mm(h, lp["w_in"][l, k - 1], cdt)
            for j in range(k - 1):
                back = (k - 1 - j) * d
                tap = lax.dynamic_slice_in_dim(hx, need - back, Tl, axis=1)
                z = z + _mm(tap, lp["w_in"][l, j], cdt)
            if "b_in" in lp:
                z = z + lp["b_in"][l]
            f, g = jnp.split(z, 2, axis=-1)
            u = jnp.tanh(f) * jax.nn.sigmoid(g)
            s = _mm(u, lp["w_skip"][l], cdt)
            if "b_skip" in lp:
                s = s + lp["b_skip"][l]
            skip = skip + s
            r = _mm(u, lp["w_res"][l], cdt)
            if "b_res" in lp:
                r = r + lp["b_res"][l]
            h = r + h
        y = jax.nn.relu(skip)
        y = jax.nn.relu(_mm(y, params["end1"]["w"], cdt) + params["end1"]["b"])
        return _mm(y, params["end2"]["w"], cdt) + params["end2"]["b"]

    fn = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(None, axis_name)),
        out_specs=P(None, axis_name),
        check_vma=False,
    )
    return fn(params, x)


def time_sharded_loss(
    params: Params,
    cfg: WaveNetConfig,
    x: jnp.ndarray,
    target: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
) -> jnp.ndarray:
    """Teacher-forced CE over the valid suffix with T sharded.

    ``target``: ``(N, T)`` where ``target[:, t]`` labels position t (i.e.
    x shifted by one); only positions with a full receptive field
    (t >= rf - 1) count, masked locally per shard — no gather of the
    logits to one chip. Differentiable; grads match the unsharded loss."""
    T = x.shape[1]
    rf = cfg.receptive_field
    if T < rf:
        raise ValueError(
            f"T={T} < receptive field {rf}: no position has a full "
            "receptive field, the masked loss would be 0/0"
        )
    logits = time_sharded_logits(params, cfg, x, mesh, axis_name)
    pos = jnp.arange(T)[None, :]
    valid = (pos >= rf - 1).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / (jnp.sum(valid) * x.shape[0])
