"""Cross-chip pipelined generation: layer-pipeline over a device mesh.

For models whose trunk weights exceed one chip's fast memory, the stacked
per-layer parameters are split into ``P`` contiguous stages sharded over a
``('pipe',)`` mesh axis, and autoregressive sampling runs as a round-robin
stream pipeline: the ``S`` streams are split into ``G = P`` groups and at
pipeline tick ``T`` stage ``s`` processes group ``(T - s) mod G`` at its own
time step. Every tick, each stage pushes its residual/skip packet to the
next stage and the last stage feeds the sampled class back to the first with
a single ring ``ppermute`` — steady state keeps all ``P`` chips busy and
produces one full ``(S/G)``-stream sample per tick.

This is the distributed counterpart of the single-chip fast path
(models/generate.py gen_step): same ring-buffer queue semantics (reference:
wavenet_modules.py:42-77), same tap/accumulation order, so per-group argmax
rollouts match :func:`..models.generate.generate_fast` exactly. The
reference has no multi-device analogue (SURVEY.md §2.3); this implements
the ROADMAP "cross-chip pipelined generation" item.

Design notes (SPMD constraints):

* shard_map traces ONE program for all stages, so nothing about the control
  flow may depend on the stage id. Per-stage dilations are therefore traced
  ``int32`` data — ring slots become dynamic indices into a uniform
  ``(k-1)*max_dilation + 1``-length buffer per layer, with each layer still
  stepping modulo its own exact period (identical math to GenState's
  exactly-sized rings, just padded to a stage-uniform shape).
* The embedding and the end head are small next to the trunk; their weights
  stay replicated and every stage computes them, with ``jnp.where`` masks
  selecting which stage's result is real. That keeps the program uniform
  and costs two small matmuls per tick.
* Warmup/drain ticks are masked (``valid``): ring writes and output writes
  are suppressed, and the class feedback link only matters on ticks where
  the consuming step is past the prime — which is always a valid producer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental import mesh_utils

from ..config import WaveNetConfig
from ..models.generate import _sample, buffer_length
from ..models.wavenet import Params, _mm
from ..ops.mulaw import mu_law_expansion_jnp

PIPE_AXIS = "pipe"


def make_pipeline_mesh(n_stages: int, devices=None) -> Mesh:
    """A 1-axis ``('pipe',)`` mesh over ``n_stages`` devices."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[:n_stages])
    if devices.size != n_stages:
        raise ValueError(f"need {n_stages} devices, have {devices.size}")
    return Mesh(mesh_utils.create_device_mesh((n_stages,), devices=devices),
                (PIPE_AXIS,))


def _stage_stack(a: jnp.ndarray, n_stages: int) -> jnp.ndarray:
    """(L, ...) per-layer stack -> (P, L/P, ...) per-stage stack."""
    L = a.shape[0]
    return a.reshape((n_stages, L // n_stages) + a.shape[1:])


@partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "num_samples", "temperature",
                     "regularize"),
)
def _generate_pipelined_jit(
    params: Params,
    cfg: WaveNetConfig,
    mesh: Mesh,
    key: jax.Array,
    num_samples: int,
    first_samples: jnp.ndarray,
    temperature: float,
    regularize: float,
    global_cond: jnp.ndarray | None,
):
    n_stages = mesh.shape[PIPE_AXIS]
    L = cfg.num_layers
    Lp = L // n_stages
    G = n_stages  # stream groups == stages: full steady-state utilization
    k = cfg.kernel_size
    R = cfg.residual_channels
    SK = cfg.skip_channels
    C = cfg.classes
    cdt = cfg.compute_dtype
    Pmax = buffer_length(cfg)

    S_total, num_given = first_samples.shape
    Sg = S_total // G
    total = num_given - 1 + num_samples
    ticks = total * n_stages + n_stages - 1

    lp = params["layers"]
    bias = "b_in" in lp
    stage = {
        "w_in": _stage_stack(lp["w_in"], n_stages),
        "w_res": _stage_stack(lp["w_res"], n_stages),
        "w_skip": _stage_stack(lp["w_skip"], n_stages),
    }
    if bias:
        for name in ("b_in", "b_res", "b_skip"):
            stage[name] = _stage_stack(lp[name], n_stages)
    has_gcond = global_cond is not None
    if has_gcond:
        stage["w_gcond"] = _stage_stack(lp["w_gcond"], n_stages)
        gcond = global_cond.reshape(G, Sg, -1)
    dil = jnp.asarray(cfg.dilations, jnp.int32).reshape(n_stages, Lp)

    prime = first_samples.reshape(G, Sg, num_given)
    # per-group uniforms identical to what generate_fast draws for that
    # group under fold_in(key, g) — keeps temperature>0 rollouts comparable
    uniforms = jnp.stack(
        [jax.random.uniform(jax.random.fold_in(key, g), (total, Sg))
         for g in range(G)]
    )  # (G, total, Sg)

    # embedding + head weights are small; they replicate to every stage
    # (explicit args — shard_map closure over traced values is not portable)
    repl = {
        "w_start": params["start"]["w"],
        "end1_w": params["end1"]["w"], "end1_b": params["end1"]["b"],
        "end2_w": params["end2"]["w"], "end2_b": params["end2"]["b"],
    }
    if "b" in params["start"]:
        repl["b_start"] = params["start"]["b"]

    def run(stage_p, repl, dil_s, prime, uniforms, *gc):
        # each device sees a (1, Lp, ...) slice of every stage array
        dil_s = dil_s[0]
        s_id = lax.axis_index(PIPE_AXIS)
        is_first = s_id == 0
        is_last = s_id == n_stages - 1

        rings = jnp.zeros((G, Sg, Lp, Pmax, R), jnp.float32)
        h0 = jnp.zeros((Sg, R), jnp.float32)
        skip0 = jnp.zeros((Sg, SK), jnp.float32)
        cls0 = jnp.zeros((Sg,), jnp.int32)
        out0 = jnp.zeros((G, total, Sg), jnp.int32)

        def tick(carry, T):
            rings, h_in, skip_in, cls_in, out = carry
            g = jnp.mod(T - s_id, G)
            n = lax.div(T - s_id, G)  # may be negative during warmup
            valid = (T >= s_id) & (n < total)
            nc = jnp.clip(n, 0, total - 1)

            # --- stage input -------------------------------------------
            prime_cls = lax.dynamic_index_in_dim(
                prime, g, axis=0, keepdims=False
            )[:, jnp.minimum(nc, num_given - 1)]
            cls_use = jnp.where(nc < num_given, prime_cls, cls_in)
            h_emb = jnp.take(repl["w_start"], cls_use, axis=0)
            if "b_start" in repl:
                h_emb = h_emb + repl["b_start"]
            h = jnp.where(is_first, h_emb.astype(jnp.float32), h_in)
            skip = jnp.where(is_first, 0.0, skip_in)

            # --- this stage's layers (gen_step semantics, dynamic dil) --
            rings_g = lax.dynamic_index_in_dim(rings, g, axis=0,
                                               keepdims=False)
            if has_gcond:
                gc_g = lax.dynamic_index_in_dim(gc[0], g, axis=0,
                                                keepdims=False)
            new_bufs = []
            for l in range(Lp):
                d = dil_s[l]
                Pl = (k - 1) * d + 1
                slot = jnp.mod(nc, Pl)
                buf = rings_g[:, l]  # (Sg, Pmax, R)
                wrote = lax.dynamic_update_slice(
                    buf, h[:, None, :], (0, slot, 0)
                )
                new_bufs.append(jnp.where(valid, wrote, buf))
                z = _mm(h, stage_p["w_in"][0, l, k - 1], cdt)
                for j in range(k - 1):
                    m = (k - 1 - j) * d
                    idx = jnp.mod(nc - m, Pl)
                    tap = lax.dynamic_slice(buf, (0, idx, 0), (Sg, 1, R))
                    z = z + _mm(tap[:, 0].astype(jnp.float32),
                                stage_p["w_in"][0, l, j], cdt)
                if has_gcond:
                    z = z + _mm(gc_g, stage_p["w_gcond"][0, l], cdt)
                if bias:
                    z = z + stage_p["b_in"][0, l]
                f, gate = jnp.split(z, 2, axis=-1)
                u = jnp.tanh(f) * jax.nn.sigmoid(gate)
                sk = _mm(u, stage_p["w_skip"][0, l], cdt)
                if bias:
                    sk = sk + stage_p["b_skip"][0, l]
                skip = skip + sk
                r = _mm(u, stage_p["w_res"][0, l], cdt)
                if bias:
                    r = r + stage_p["b_res"][0, l]
                h = r + h
            rings = lax.dynamic_update_slice(
                rings,
                jnp.stack(new_bufs, axis=1)[None],
                (g, 0, 0, 0, 0),
            )

            # --- head + sampling (real only on the last stage) ----------
            y = jax.nn.relu(skip)
            y = jax.nn.relu(_mm(y, repl["end1_w"], cdt) + repl["end1_b"])
            logits = _mm(y, repl["end2_w"], cdt) + repl["end2_b"]
            u_row = lax.dynamic_index_in_dim(
                uniforms, g, axis=0, keepdims=False
            )[nc]
            sampled = _sample(logits, u_row, C, temperature,
                              regularize).astype(jnp.int32)
            upd = lax.dynamic_update_slice(
                out, sampled[None, None, :], (g, nc, 0)
            )
            out = jnp.where(is_last & valid, upd, out)

            # --- rotate packets one stage forward -----------------------
            perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
            h_nxt = lax.ppermute(h, PIPE_AXIS, perm)
            skip_nxt = lax.ppermute(skip, PIPE_AXIS, perm)
            cls_nxt = lax.ppermute(sampled, PIPE_AXIS, perm)
            return (rings, h_nxt, skip_nxt, cls_nxt, out), None

        (_, _, _, _, out), _ = lax.scan(
            tick, (rings, h0, skip0, cls0, out0),
            jnp.arange(ticks, dtype=jnp.int32),
        )
        # only the last stage accumulated real samples
        return lax.psum(jnp.where(is_last, out, 0), PIPE_AXIS)

    gc_args = (gcond,) if has_gcond else ()
    gc_specs = (P(),) if has_gcond else ()
    out = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(PIPE_AXIS), stage),
            jax.tree.map(lambda _: P(), repl),
            P(PIPE_AXIS), P(), P(),
        ) + gc_specs,
        out_specs=P(),
        check_vma=False,
    )(stage, repl, dil, prime, uniforms, *gc_args)

    cls = out[:, num_given - 1:, :]  # (G, num_samples, Sg)
    cls = jnp.moveaxis(cls, 1, 2).reshape(S_total, num_samples)
    wav = mu_law_expansion_jnp(
        (cls.astype(jnp.float32) / C) * 2.0 - 1.0, C
    )
    return wav, cls


def generate_pipelined(
    params: Params,
    cfg: WaveNetConfig,
    mesh: Mesh,
    key: jax.Array,
    num_samples: int,
    first_samples: jnp.ndarray | None = None,
    temperature: float = 1.0,
    regularize: float = 0.0,
    global_cond: jnp.ndarray | None = None,
):
    """Layer-pipelined generation over the ``('pipe',)`` mesh.

    ``first_samples``: int32 ``(S, num_given)`` prime (or ``(num_given,)``
    for S=1); ``S`` must divide into ``n_stages`` equal stream groups and
    ``cfg.num_layers`` into ``n_stages`` equal stages. Group ``g`` (streams
    ``[g*S/G, (g+1)*S/G)``) reproduces
    ``generate_fast(..., key=fold_in(key, g))`` exactly — the groups are
    independent rollouts that happen to share the pipeline.

    Returns ``(waveform (S, num_samples) float32, classes int32)``.
    """
    n_stages = mesh.shape[PIPE_AXIS]
    if cfg.num_layers % n_stages != 0:
        raise ValueError(
            f"{cfg.num_layers} layers not divisible into {n_stages} stages"
        )
    if first_samples is None:
        first_samples = jnp.full((n_stages, 1), cfg.classes // 2, jnp.int32)
    first_samples = jnp.atleast_2d(first_samples).astype(jnp.int32)
    if first_samples.shape[0] % n_stages != 0:
        raise ValueError(
            f"{first_samples.shape[0]} streams not divisible into "
            f"{n_stages} groups"
        )
    if global_cond is not None and cfg.gcond_channels == 0:
        raise ValueError("global_cond given but cfg.gcond_channels == 0")
    return _generate_pipelined_jit(
        params, cfg, mesh, key, num_samples, first_samples,
        temperature, regularize, global_cond,
    )
