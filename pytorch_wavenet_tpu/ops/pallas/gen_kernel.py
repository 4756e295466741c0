"""Fused Pallas generation kernel.

The entire autoregressive loop — ring-buffer update, gated dilated convs,
residual/skip, output head, temperature sampling, feedback — runs inside ONE
``pallas_call``. All weights and all per-layer ring buffers live in VMEM for
the whole clip: after the initial weight load there is no HBM traffic except
streaming out the sampled classes. This is the TPU-native replacement for
the reference's per-step Python loop over 30-40 ``DilatedQueue`` objects with
a host round-trip per sample (reference: wavenet_model.py:276-311,
wavenet_modules.py:42-77), and the "fused single-step kernel" SURVEY.md §7
calls for.

Design notes (what makes this fast):

* the layer loop is **statically unrolled** — each layer's dilation is a
  compile-time constant, so every ring buffer is sized exactly
  ``(kernel_size-1)*d + 1`` rows of ``(streams, R)`` and indexed with cheap
  static-modulus arithmetic;
* everything stays **sublane-major**: activations are ``(streams, C)``
  tiles, ring rows are ``(streams, R)`` blocks at dynamic *sublane* offsets
  (dynamic lane indexing is illegal on TPU); sampled classes accumulate into
  a lane-packed ``(streams, 128)`` carry (iota-select — a ``(N, 1)`` int32
  output would tile to ``(8, 128)`` and waste 128x VMEM) flushed as one row
  block per 128 steps;
* per layer: one tap dot per kernel tap (ring-tap dots don't depend on the
  current activation, so they overlap the critical path) and one fused
  ``(streams, D) @ (D, S+R)`` skip|residual output dot;
* the input embedding is a per-stream dynamic **row gather** from the start
  conv — not a one-hot matmul — so it is bit-exact with the XLA paths'
  ``jnp.take`` and argmax rollouts match them exactly;
* sampling uses the on-core PRNG (Gumbel-argmax over tempered logits), so
  temperature>0 draws differ from the XLA path's inverse-CDF stream;
  temperature=0 matches the XLA and naive paths exactly, which the
  equivalence tests pin.

VMEM budget (f32): weights (~4.5 MB for the chaconne config) + ring buffers
``2*receptive_field*R*streams`` — streams<=8 fits comfortably; beyond that
use the sharded XLA path (``parallel.training.sharded_generate_fast``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import WaveNetConfig
from ...models.wavenet import Params
from ...ops.mulaw import mu_law_expansion_jnp


class FusedGenState(NamedTuple):
    """Streaming state for :func:`generate_fast_fused`: the VMEM kernel's
    ring buffers round-tripped through HBM between calls, plus the global
    time cursor and the next input class per stream. Passing this back in
    continues the rollout exactly where it stopped — no re-priming, bitwise
    identical to an uninterrupted run at temperature 0 (the persistent-queue
    capability of the reference's DilatedQueue objects,
    wavenet_model.py:78-81, as an explicit value)."""

    rings: tuple          # L arrays, (P_l * streams, R) f32
    t: jnp.ndarray        # () int32 — absolute steps completed
    cls: jnp.ndarray      # (streams,) int32 — next input class

# soft cap on kernel VMEM use (per-core VMEM is ~16 MB)
_VMEM_BUDGET_BYTES = 13 * 1024 * 1024

# output chunk: samples accumulate in a lane-packed carry for this many
# steps per flushed row block
_CHUNK = 128


def _tiled_bytes(sublanes: int, lanes: int, itemsize: int = 4) -> int:
    """Physical VMEM footprint of a 2D f32/i32 array: the (8, 128) tile
    grid pads both trailing dims."""
    return (-(-sublanes // 8) * 8) * (-(-lanes // 128) * 128) * itemsize


def fused_vmem_bytes(cfg: WaveNetConfig, streams: int = 1,
                     total_steps: int = 0) -> int:
    """Tiling-aware VMEM footprint: weights + ring buffers + packed output.
    Lane padding dominates for 32-channel models (32 lanes -> one 128 tile)."""
    L, k = cfg.num_layers, cfg.kernel_size
    R, D, S, E, C = (
        cfg.residual_channels, cfg.dilation_channels, cfg.skip_channels,
        cfg.end_channels, cfg.classes,
    )
    weights = (
        _tiled_bytes(C, R)                      # start
        + L * k * _tiled_bytes(R, 2 * D)        # taps
        + L * _tiled_bytes(D, S + R)            # skip|res
        + L * _tiled_bytes(1, 2 * D) + L * _tiled_bytes(1, S + R)  # biases
        + _tiled_bytes(S, E) + _tiled_bytes(E, C)
        + _tiled_bytes(1, E) + _tiled_bytes(1, C)
    )
    rings = sum(
        _tiled_bytes(((k - 1) * d + 1) * streams, R) for d in cfg.dilations
    )
    out = _tiled_bytes(-(-max(total_steps, 1) // _CHUNK) * streams, _CHUNK)
    return weights + rings + out


def _make_kernel(cfg: WaveNetConfig, streams: int, num_given: int, total: int,
                 temperature: float, regularize: float, resume: bool = False,
                 has_cond: bool = False, has_gcond: bool = False,
                 fuse_res: bool = False):
    L = cfg.num_layers
    k = cfg.kernel_size
    D = cfg.dilation_channels
    S = cfg.skip_channels
    dil = cfg.dilations
    periods = [(k - 1) * d + 1 for d in dil]
    Sst = streams

    def kernel(*refs):
        (
            seed_ref,    # (1, 1) int32
            prime_ref,   # (num_given*Sst, 1) int32, sublane-major per step
            w_start_ref, # (C, R)
            b_start_ref, # (1, R)
            w_tap_ref,   # (L, k, R, 2D) fused filter+gate per tap
            b_in_ref,    # (L, 2D)
            w_out_ref,   # (L, D, S+R) fused skip|residual
            b_out_ref,   # (L, S+R)
            w_end1_ref,  # (S, E)
            b_end1_ref,  # (1, E)
            w_end2_ref,  # (E, C)
            b_end2_ref,  # (1, C)
        ) = refs[:12]
        refs = refs[12:]
        if fuse_res:
            # pre-multiplied chain weights (see generate_fast_fused):
            # wf[l] = w_res[l] @ w_cur[l+1], bf[l] = b_res[l] @ w_cur[l+1]
            # + b_in[l+1]
            wf_ref, bf_ref = refs[:2]  # (L-1, D, 2D); (L-1, 2D)
            refs = refs[2:]
        if has_cond:
            # pre-projected conditioning, HBM: (total*L*Sst, 2Dp) — step t's
            # slab is rows [t*L*Sst, (t+1)*L*Sst), layer l at offset l*Sst.
            # The M->2D projection ran OUTSIDE the kernel as one batched
            # MXU einsum over all steps; inside the serial loop conditioning
            # is a DMA-prefetched add, not a per-step dot.
            cond_ref = refs[0]
            refs = refs[1:]
        if has_gcond:
            gproj_ref = refs[0]  # (L*Sst, 2D) VMEM: per-layer global add
            refs = refs[1:]
        if resume:
            t0_ref = refs[0]           # (1, 1) int32 absolute start time
            ring_in_refs = refs[1 : 1 + L]
            refs = refs[1 + L :]
        # outputs:
        out_ref = refs[0]  # (n_chunks*Sst, _CHUNK) int32 — samples packed
        #                    into lanes, one (Sst, _CHUNK) row block per
        #                    chunk of steps. (A (N,1) int32 buffer would
        #                    tile to (8,128) and waste 128x VMEM.)
        buf_refs = refs[1 : 1 + L]  # L ring buffers, (P_l*Sst, R) each
        refs = refs[1 + L :]
        if has_cond:
            # scratch: double-buffered cond slab + its DMA semaphores
            cond_vmem, cond_sems = refs  # (2*L*Sst, 2Dp) f32; (2,) DMA

        if temperature > 0:  # static; argmax path never consumes randomness
            pltpu.prng_seed(seed_ref[0, 0])

        if has_cond:
            def cond_dma(t, slot):
                return pltpu.make_async_copy(
                    cond_ref.at[pl.ds(t * L * Sst, L * Sst), :],
                    cond_vmem.at[pl.ds(slot * L * Sst, L * Sst), :],
                    cond_sems.at[slot],
                )

            cond_dma(0, 0).start()
        if resume:
            toff = t0_ref[0, 0]
            for b, b_in in zip(buf_refs, ring_in_refs):
                b[...] = b_in[...]
        else:
            toff = 0
            for b in buf_refs:
                b[...] = jnp.zeros_like(b)

        if regularize != 0.0:
            reg = (
                lax.broadcasted_iota(jnp.float32, (Sst, cfg.classes), 1)
                - cfg.classes / 2.0
            ) ** 2 * regularize
        else:
            reg = None

        def step(t, carry):
            cls, acc = carry  # (Sst,1) current classes, (Sst,_CHUNK) chunk acc
            # embed: per-stream dynamic row gather (bit-exact with jnp.take)
            rows = [
                w_start_ref[pl.ds(cls[s, 0], 1), :] for s in range(Sst)
            ]
            h = (rows[0] if Sst == 1 else jnp.concatenate(rows, axis=0))
            h = h + b_start_ref[...]  # (Sst, R)
            skip = jnp.zeros((Sst, S), jnp.float32)

            if has_cond:
                # wait for this step's slab, prefetch the next behind it
                cond_dma(t, t % 2).wait()
                slot_base = (t % 2) * L * Sst

                @pl.when(t + 1 < total)
                def _prefetch():
                    cond_dma(t + 1, (t + 1) % 2).start()

            ta = t + toff  # absolute time: ring slots persist across calls

            # Ring-tap dots for EVERY layer depend only on previous steps'
            # state (a tap's slot (ta - m*d) mod P never equals this step's
            # write slot ta mod P for 0 < m*d < P), so they are hoisted off
            # the serial layer chain here and can overlap it. The adds below
            # keep the original order, so logits stay bitwise identical.
            tap_dots = [
                [
                    jnp.dot(
                        buf_refs[l][
                            pl.ds(
                                ((ta - (k - 1 - j) * dil[l]) % periods[l])
                                * Sst,
                                Sst,
                            ),
                            :,
                        ],
                        w_tap_ref[l, j],
                        preferred_element_type=jnp.float32,
                    )
                    for j in range(k - 1)
                ]
                for l in range(L)
            ]

            def z_extras(l, z):
                """State-only additions for layer l: hoisted tap dots plus
                conditioning — none depend on the current activation."""
                for j in range(k - 1):
                    z = z + tap_dots[l][j]
                if has_cond:
                    z = z + cond_vmem[pl.ds(slot_base + l * Sst, Sst), : 2 * D]
                if has_gcond:
                    z = z + gproj_ref[pl.ds(l * Sst, Sst), :]
                return z

            if not fuse_res:
                for l in range(L):  # statically unrolled
                    buf = buf_refs[l]
                    # k taps: current h plus k-1 hoisted ring-tap dots
                    # (reference dequeue, wavenet_modules.py:59-72)
                    z = jnp.dot(
                        h, w_tap_ref[l, k - 1],
                        preferred_element_type=jnp.float32,
                    ) + b_in_ref[pl.ds(l, 1), :]
                    z = z_extras(l, z)
                    u = jnp.tanh(z[:, :D]) * jax.nn.sigmoid(z[:, D:])
                    sr = (
                        jnp.dot(u, w_out_ref[l],
                                preferred_element_type=jnp.float32)
                        + b_out_ref[pl.ds(l, 1), :]
                    )  # (Sst, S+R)
                    skip = skip + sr[:, :S]
                    # ring write after the reads (reference enqueue,
                    # wavenet_modules.py:55-57)
                    buf[pl.ds((ta % periods[l]) * Sst, Sst), :] = h
                    h = h + sr[:, S:]
            else:
                # fuse_res: the serial chain is one dot per layer —
                # z[l+1] = (h[l] @ w_cur[l+1] + bf[l] + extras[l+1])
                #          + u[l] @ wf[l]
                # with wf[l] = w_res[l] @ w_cur[l+1] pre-multiplied on host.
                # The h-dependent "pre" term and the residual/skip updates
                # have a full layer of slack, so only act -> dot(wf) chains.
                z = z_extras(
                    0,
                    jnp.dot(h, w_tap_ref[0, k - 1],
                            preferred_element_type=jnp.float32)
                    + b_in_ref[pl.ds(0, 1), :],
                )
                for l in range(L):
                    buf_refs[l][pl.ds((ta % periods[l]) * Sst, Sst), :] = h
                    if l + 1 < L:
                        pre = (
                            jnp.dot(h, w_tap_ref[l + 1, k - 1],
                                    preferred_element_type=jnp.float32)
                            + bf_ref[pl.ds(l, 1), :]
                        )
                        pre = z_extras(l + 1, pre)
                    u = jnp.tanh(z[:, :D]) * jax.nn.sigmoid(z[:, D:])
                    if l + 1 < L:
                        z = pre + jnp.dot(
                            u, wf_ref[l], preferred_element_type=jnp.float32
                        )
                    sr = (
                        jnp.dot(u, w_out_ref[l],
                                preferred_element_type=jnp.float32)
                        + b_out_ref[pl.ds(l, 1), :]
                    )
                    skip = skip + sr[:, :S]
                    h = h + sr[:, S:]

            # head (reference: wavenet_model.py:167-170)
            y = jnp.maximum(skip, 0.0)
            y = jnp.maximum(
                jnp.dot(y, w_end1_ref[...],
                        preferred_element_type=jnp.float32)
                + b_end1_ref[...],
                0.0,
            )
            logits = (
                jnp.dot(y, w_end2_ref[...],
                        preferred_element_type=jnp.float32)
                + b_end2_ref[...]
            )  # (Sst, C)
            if reg is not None:
                logits = logits - reg

            if temperature > 0:
                bits = pltpu.bitcast(
                    pltpu.prng_random_bits((Sst, cfg.classes)), jnp.uint32
                )
                # top 24 bits -> uniform [0,1); >>8 clears the sign bit so
                # the int32 view equals the uint32 value (Mosaic has no
                # uint32->f32 cast)
                bits24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
                u01 = bits24.astype(jnp.float32) * (1.0 / (1 << 24))
                u01 = jnp.clip(u01, 1e-7, 1.0 - 1e-7)
                gumbel = -jnp.log(-jnp.log(u01))
                sampled = jnp.argmax(logits / temperature + gumbel, axis=-1)
            else:
                sampled = jnp.argmax(logits, axis=-1)
            sampled = sampled.astype(jnp.int32).reshape(Sst, 1)

            # pack the sample into its lane of the chunk accumulator (a
            # dynamic lane index is illegal on TPU; an iota-select is cheap)
            lane_ids = lax.broadcasted_iota(jnp.int32, (Sst, _CHUNK), 1)
            acc = jnp.where(lane_ids == t % _CHUNK, sampled, acc)

            @pl.when((t % _CHUNK == _CHUNK - 1) | (t == total - 1))
            def _flush():
                out_ref[pl.ds((t // _CHUNK) * Sst, Sst), :] = acc

            # next input: prime while priming, else the sample
            in_prime = t + 1 < num_given
            pidx = jnp.minimum(t + 1, num_given - 1) * Sst
            prime_row = prime_ref[pl.ds(pidx, Sst), :]
            return jnp.where(in_prime, prime_row, sampled), acc

        lax.fori_loop(
            0,
            total,
            lambda t, c: step(t, c),
            (
                prime_ref[pl.ds(0, Sst), :],
                jnp.zeros((Sst, _CHUNK), jnp.int32),
            ),
        )

    return kernel, periods


@partial(
    jax.jit,
    static_argnames=("cfg", "num_samples", "temperature", "regularize",
                     "return_state", "interpret", "fuse_res"),
)
def generate_fast_fused(
    params: Params,
    cfg: WaveNetConfig,
    key: jax.Array,
    num_samples: int,
    first_samples: jnp.ndarray | None = None,
    temperature: float = 1.0,
    regularize: float = 0.0,
    cond: jnp.ndarray | None = None,
    global_cond: jnp.ndarray | None = None,
    state: FusedGenState | None = None,
    return_state: bool = False,
    interpret: bool = False,
    fuse_res: bool = False,
):
    """Fused generation for a small number of streams (VMEM-resident state).

    Same contract as ``models.generate.generate_fast``, including
    conditioning: ``cond`` is ``(streams, total, cond_channels)`` with row t
    conditioning step t (the vocoder path), ``global_cond`` is
    ``(streams, gcond_channels)``. Both are pre-projected to per-layer gate
    inputs OUTSIDE the kernel (one batched MXU einsum over every step at
    once); the serial loop sees conditioning as a DMA-prefetched add —
    double-buffered (L*streams, 2D) slabs from HBM for ``cond``, a
    VMEM-resident table for ``global_cond`` — so the per-step critical path
    gains no dots. Returns ``(waveform (S, num_samples), classes
    (S, num_samples))`` — plus a :class:`FusedGenState` when
    ``return_state`` is true. Passing that state back (with
    ``first_samples=None``) continues the rollout without re-priming:
    chunked streaming equals a single shot bitwise at temperature 0 (pass
    the matching cond rows per chunk). The stream count is bounded by VMEM
    (see :func:`fused_vmem_bytes`); use the sharded XLA path or the HBM
    kernel for large batches.

    ``fuse_res=True`` shortens the serial per-layer chain to ONE matmul:
    the next layer's gate input is rewritten as
    ``z[l+1] = h[l] @ w_cur[l+1] + u[l] @ (w_res[l] @ w_cur[l+1]) + ...``
    with the weight product pre-multiplied on host, so only
    ``act -> dot`` chains layer to layer and the residual/skip updates
    gain a full layer of slack. Mathematically identical but floating-
    point-reassociated: logits agree to ~1e-5 with the exact path, so
    argmax rollouts can diverge on near-ties — the default stays exact
    (bitwise-pinned to the XLA and naive paths)."""
    resume = state is not None
    if resume:
        if first_samples is not None:
            raise ValueError("pass either first_samples or state, not both")
        streams = state.cls.shape[0]
        # the carried class is the single "given" input of this call
        first_samples = state.cls.reshape(streams, 1).astype(jnp.int32)
        num_given = 1
    else:
        if first_samples is None:
            first_samples = jnp.full((1, 1), cfg.classes // 2, jnp.int32)
        first_samples = jnp.atleast_2d(first_samples).astype(jnp.int32)
        streams, num_given = first_samples.shape
    total = num_given - 1 + num_samples

    need = fused_vmem_bytes(cfg, streams, total)
    if resume:  # ring inputs live alongside the ring outputs
        need += sum(
            _tiled_bytes(((cfg.kernel_size - 1) * d + 1) * streams,
                         cfg.residual_channels)
            for d in cfg.dilations
        )
    if cond is not None:  # double-buffered pre-projected cond slabs
        need += _tiled_bytes(
            2 * cfg.num_layers * streams,
            -(-2 * cfg.dilation_channels // 128) * 128,
        )
    if global_cond is not None:
        need += _tiled_bytes(
            cfg.num_layers * streams, 2 * cfg.dilation_channels
        )
    if fuse_res:  # pre-multiplied chain weights
        need += (cfg.num_layers - 1) * _tiled_bytes(
            cfg.dilation_channels, 2 * cfg.dilation_channels
        ) + _tiled_bytes(cfg.num_layers - 1, 2 * cfg.dilation_channels)
    if need > _VMEM_BUDGET_BYTES:
        raise ValueError(
            f"{streams} streams x {total} steps need ~{need/1e6:.1f} MB of "
            "VMEM; use models.generate.generate_fast for large batches, or "
            "generate in chunks"
        )

    L, k = cfg.num_layers, cfg.kernel_size
    R, D, S, E, C = (
        cfg.residual_channels, cfg.dilation_channels, cfg.skip_channels,
        cfg.end_channels, cfg.classes,
    )
    f32 = jnp.float32
    lp = params["layers"]

    # fused weights: filter|gate per tap (L,k,R,2D); [skip|res] -> (L,D,S+R)
    w_tap = lp["w_in"].astype(f32)
    w_out = jnp.concatenate(
        [lp["w_skip"].astype(f32), lp["w_res"].astype(f32)], axis=2
    )
    b_in = lp.get("b_in", jnp.zeros((L, 2 * D))).astype(f32)
    b_out = jnp.concatenate(
        [
            lp.get("b_skip", jnp.zeros((L, S))).astype(f32),
            lp.get("b_res", jnp.zeros((L, R))).astype(f32),
        ],
        axis=1,
    )
    # sublane-major prime: step t's classes are rows [t*S : (t+1)*S]
    prime_col = first_samples.T.reshape(num_given * streams, 1)

    cond_args, cond_specs, cond_scratch = [], [], []
    if cond is not None:
        if cfg.cond_channels == 0:
            raise ValueError("cond given but cfg.cond_channels == 0")
        if cond.shape != (streams, total, cfg.cond_channels):
            raise ValueError(
                f"cond shape {cond.shape} != (streams, num_given-1+"
                f"num_samples, cond_channels) = "
                f"{(streams, total, cfg.cond_channels)}"
            )
        # project every step's cond rows through every layer's w_cond in one
        # batched matmul; row (t*L + l)*Sst + s of the result is step t,
        # layer l, stream s. Lane-pad 2D to a 128 multiple: HBM DMA slices
        # need full-tile lane widths.
        proj = jnp.einsum(
            "stm,lmd->tlsd", cond.astype(f32), lp["w_cond"].astype(f32)
        ).reshape(total * L * streams, 2 * D)
        Dp = -(-2 * D // 128) * 128
        cond_args.append(jnp.pad(proj, ((0, 0), (0, Dp - 2 * D))))
        cond_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # stays in HBM
        cond_scratch = [
            pltpu.VMEM((2 * L * streams, Dp), f32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    if global_cond is not None:
        if cfg.gcond_channels == 0:
            raise ValueError("global_cond given but cfg.gcond_channels == 0")
        gproj = jnp.einsum(
            "sg,lgd->lsd", global_cond.astype(f32), lp["w_gcond"].astype(f32)
        ).reshape(L * streams, 2 * D)
        cond_args.append(gproj)
        cond_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    args = [
        jax.random.randint(key, (1, 1), 0, np.iinfo(np.int32).max, jnp.int32),
        prime_col,
        params["start"]["w"].astype(f32),
        params["start"].get("b", jnp.zeros((R,))).reshape(1, R).astype(f32),
        w_tap,
        b_in,
        w_out,
        b_out,
        params["end1"]["w"].astype(f32),
        params["end1"]["b"].reshape(1, E).astype(f32),
        params["end2"]["w"].astype(f32),
        params["end2"]["b"].reshape(1, C).astype(f32),
    ]
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args)
    if fuse_res:
        # chain weights: wf[l] = w_res[l] @ w_cur[l+1]  (D, 2D), and the
        # folded bias bf[l] = b_res[l] @ w_cur[l+1] + b_in[l+1]
        w_res = lp["w_res"].astype(f32)  # (L, D, R)
        w_cur = w_tap[:, k - 1]  # (L, R, 2D)
        b_res = lp.get("b_res", jnp.zeros((L, R))).astype(f32)
        args.append(jnp.einsum("ldr,lrm->ldm", w_res[:-1], w_cur[1:]))
        args.append(
            jnp.einsum("lr,lrm->lm", b_res[:-1], w_cur[1:]) + b_in[1:]
        )
        in_specs.extend([pl.BlockSpec(memory_space=pltpu.VMEM)] * 2)
    args.extend(cond_args)
    in_specs.extend(cond_specs)
    kernel, periods = _make_kernel(
        cfg, streams, num_given, total, float(temperature), float(regularize),
        resume=resume, has_cond=cond is not None,
        has_gcond=global_cond is not None, fuse_res=fuse_res,
    )
    if resume:
        args.append(state.t.astype(jnp.int32).reshape(1, 1))
        args.extend(r.astype(f32) for r in state.rings)
        in_specs.extend(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(periods))
        )

    n_chunks = -(-total // _CHUNK)
    out, *rings_out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=in_specs,
        out_specs=tuple(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(periods))
        ),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((n_chunks * streams, _CHUNK), jnp.int32)]
            + [jax.ShapeDtypeStruct((P * streams, R), f32) for P in periods]
        ),
        scratch_shapes=cond_scratch,
        interpret=interpret,
    )(*args)

    # (n_chunks, streams, _CHUNK) -> (streams, total)
    all_cls = (
        out.reshape(n_chunks, streams, _CHUNK)
        .transpose(1, 0, 2)
        .reshape(streams, n_chunks * _CHUNK)
    )
    cls = all_cls[:, num_given - 1 : total]
    wav = mu_law_expansion_jnp(
        (cls.astype(jnp.float32) / cfg.classes) * 2.0 - 1.0, cfg.classes
    )
    if not return_state:
        return wav, cls
    t0 = state.t if resume else jnp.zeros((), jnp.int32)
    new_state = FusedGenState(
        rings=tuple(rings_out),
        t=t0 + total,
        cls=all_cls[:, total - 1],
    )
    return wav, cls, new_state
