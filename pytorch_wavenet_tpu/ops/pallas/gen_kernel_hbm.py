"""Large-batch fused generation kernel (HBM-resident ring buffers).

The VMEM kernel (``gen_kernel``) holds all queue state on-chip, which caps
the stream count at ~4-8. This kernel serves the BASELINE "batched
multi-stream generation" config: hundreds of parallel streams per chip.

Layout is **channels-first with streams in lanes** — activations are
``(channels, S)`` tiles. With S a multiple of 128 every HBM DMA slice is
lane-aligned, there is zero lane padding anywhere, and each layer's work is
an ``(out_ch, in_ch) @ (in_ch, S)`` matmul with S-wide rows — exactly the
shape the MXU wants. (The small-stream kernel is streams-in-sublanes; at
S>=128 that layout wastes 4x VMEM on 32-channel models and its HBM slices
are unaligned.)

* weights (pre-transposed) live in VMEM for the whole clip;
* per-layer ring buffers live in **HBM**, touched only via async DMA: per
  step, one ``(R, S)`` tap read per lookback tap (kernel_size - 1 of them)
  and one ``(R, S)`` activation write per layer; all tap reads are issued
  up front so transfers overlap the layer walk;
* ring buffers are not zero-initialized — a tap with lookback ``d`` is
  predicated on ``t >= d`` instead (the reference's zero-filled queues,
  wavenet_modules.py:74-77, contribute exactly zero there);
* sampled classes go into a ``(128, S)`` row accumulator flushed to HBM
  once per 128 steps; the prime stream is fetched the same way in reverse;
* the input embedding is a one-hot MXU matmul; exactness vs the XLA path's
  row gather holds only under full-precision (bf16x3) f32 passes, so parity
  tests for this kernel assert argmax-rollout equality rather than relying
  on bitwise logits.
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

_CHUNK = 128


class HbmGenState(NamedTuple):
    """Streaming state for :func:`generate_fast_batched`: the HBM-resident
    ring state (aliased straight back into the next call — no copy), the
    absolute time cursor, and the next input class per stream. Chunked
    streaming equals a single shot bitwise at temperature 0."""

    ring: jnp.ndarray     # (sum(P_l) * R, lane-padded streams), ring_dtype
    t: jnp.ndarray        # () int32 — absolute steps completed
    cls: jnp.ndarray      # (streams,) int32 — next input class (unpadded)


def _make_kernel(cfg: WaveNetConfig, streams: int, num_given: int, total: int,
                 temperature: float, regularize: float, cond_rows: int = 0,
                 has_gcond: bool = False, resume: bool = False,
                 ring_dtype=jnp.float32, fuse_res: bool = False,
                 stage_layers: int | None = None,
                 head_tiles: int | None = None,
                 lane_temp: bool = False,
                 lane_seed: bool = False,
                 skip_slab: bool = False,
                 quant: bool = False):
    L = cfg.num_layers
    D = cfg.dilation_channels
    S = cfg.skip_channels
    R = cfg.residual_channels
    C = cfg.classes
    dil = cfg.dilations
    k = cfg.kernel_size
    nt = k - 1  # lookback taps per layer (tap j looks back (nt-j)*d steps)
    periods = [(k - 1) * d + 1 for d in dil]
    ring_off = np.cumsum([0] + periods).tolist()
    NS = streams
    Mp = cond_rows  # local-conditioning rows, 0 = unconditioned
    # Chunked staging: with W = stage_layers the tap/activation slabs hold a
    # W-layer rotating window instead of all L layers (VMEM scales with
    # W*R*NS, the ceiling on stream count). Tap DMAs are issued A = W-2
    # layers ahead of their consumer; ring writes are drained once their
    # slot comes around again. Within a step tap reads and ring writes can
    # never alias (a tap's lookback m satisfies 1 <= m < period), so
    # lookahead issue is always safe; cross-step d=1 hazards are covered by
    # the end-of-step drain of the last W writes.
    W = min(stage_layers, L) if stage_layers else None
    if W is not None and W < 4:
        raise ValueError(f"stage_layers must be >= 4, got {stage_layers}")
    A = (W - 2) if W else None  # tap-issue lookahead (fuse_res consumes
    #                             layer l+1's taps at layer l: lead A-1 >= 1)
    # Cross-step tap prefetch only pays when the head is big enough to hide
    # the DMAs behind (chaconne-class skip/end widths); for small heads the
    # extra per-step predication costs more than it saves. Incompatible
    # with the rotating window (it needs all L layers' slots live at once).
    prefetch = S * cfg.end_channels >= 1 << 18 and W is None
    # Head tiling: the embed/head/sampling block is lane-pointwise across
    # streams, so it runs in G groups of NS/G lanes — its live intermediates
    # ((C, NS) one-hot/logits/noise, (E, NS) and the relu'd (S, NS) row)
    # shrink by G while the layer walk is untouched. G=1 is the identity.
    G = head_tiles or 1
    if streams % G:
        raise ValueError(f"streams {streams} not divisible by {head_tiles} "
                         "head tiles")
    NSg = streams // G
    # the gated-unit slab cannot share int8 with the ring (u in (-1, 1)
    # would truncate to {-1, 0, 1}); under int8 rings it stays bf16
    slab_dt = (ring_dtype if jnp.dtype(ring_dtype).itemsize >= 2
               else jnp.bfloat16)

    def kernel(*refs):
        (
            seed_ref,     # (1, 1) int32
            prime_ref,    # (n_prime_chunks*_CHUNK, NS) int32, ANY/HBM
            w_start_ref,  # (R, C)   start conv, transposed
            b_start_ref,  # (R, 1)
            w_cur_ref,    # (L, 2D, R) current-tap filter|gate, transposed
            w_old_ref,    # (L, nt, 2D, R) lookback taps filter|gate, transp.
            b_in_ref,     # (L, 2D, 1)
            w_out_ref,    # (L, S+R, D) skip|residual, transposed
                          # (skip_slab: (L, R, D) residual-only)
            b_out_ref,    # (L, S+R, 1)  (skip_slab: (L, R, 1))
            w_end1_ref,   # (E, S)
            b_end1_ref,   # (E, 1)
            w_end2_ref,   # (C, E)
            b_end2_ref,   # (C, 1)
        ) = refs[:13]
        refs = refs[13:]
        if quant:
            # int8 rings: (L, 1) f32 per-layer store scale (127/|h|_max);
            # the matching dequant (|h|_max/127) is folded into w_old on
            # the host, so tap reads stay a plain cast + matmul
            qscale_ref = refs[0]
            refs = refs[1:]
        if skip_slab:
            # deferred skip projection: the walk stages every layer's gated
            # unit into a (L*D, NS) slab and the head computes the skip row
            # per stream group as ONE K=L*D matmul — the MXU runs 128-deep
            # K tiles, so 30 K=D dots against a (S+R)-row weight waste ~4x
            # of every pass; the dense slab dot does the same MACs in ~3x
            # fewer passes AND removes the full-width (S, NS) accumulator
            # (the VMEM ceiling on wide-skip stream counts)
            w_skipcat_ref, b_skipsum_ref = refs[:2]  # (S, L*D); (S, 1)
            refs = refs[2:]
        if lane_temp:
            # per-stream sampling temperature, (1, NS) f32; lanes with
            # temp <= 0 take the argmax (greedy) branch
            temp_ref = refs[0]
            refs = refs[1:]
        if lane_seed:
            # per-stream noise counters: (1, NS) int32 seed and (1, NS)
            # int32 clock offset rebasing the kernel clock to each
            # request's own step count (see hash_gumbel)
            seed_row_ref, toff_row_ref = refs[:2]
            refs = refs[2:]
        if fuse_res:
            # pre-multiplied chain weights (see generate_fast_batched):
            # wf[l] = w_cur[l+1] @ w_res[l]^T  (2D, D), and the folded bias
            # bf[l] = w_cur[l+1] @ b_res[l] + b_in[l+1]
            wf_ref, bf_ref = refs[:2]  # (L-1, 2D, D); (L-1, 2D, 1)
            refs = refs[2:]
        if Mp:
            # cond_ref rows [t*Mp, (t+1)*Mp) are step t's (Mp, NS) slab
            cond_ref, w_cond_ref = refs[:2]  # HBM (total*Mp, NS); (L, 2D, Mp)
            refs = refs[2:]
        if has_gcond:
            # per-layer global-conditioning adds, pre-projected on host:
            # rows [l*2D, (l+1)*2D) are layer l's (2D, NS) gate offsets
            gproj_ref = refs[0]  # (L*2D, NS) f32, VMEM
            refs = refs[1:]
        if resume:
            # (1,1) int32 absolute start time; the ring input itself is
            # aliased onto the ring output buffer and never read directly
            t0_ref = refs[0]
            refs = refs[2:]
        (
            out_ref,      # (n_chunks*_CHUNK, NS) int32, ANY/HBM
            ring_ref,     # (sum(P_l)*R, NS) ring_dtype, ANY/HBM — queue state
            # scratch:
            tap_vmem,     # (L*nt*R, NS) ring_dtype — this step's taps
            h_vmem,       # (L*R, NS) ring_dtype — this step's activations
                          # (DMA source)
            acc_vmem,     # (_CHUNK, NS) i32 — output row accumulator
            prime_vmem,   # (_CHUNK, NS) i32 — current prime chunk
            tap_sems,     # (L*nt,) DMA
            write_sems,   # (L,) DMA
            io_sem,       # () DMA
        ) = refs[:9]
        refs = refs[9:]
        if Mp:
            cond_vmem, cond_sems = refs[:2]  # (2*Mp, NS) f32; (2,) DMA
            refs = refs[2:]
        if skip_slab:
            # (G, L*D, NSg) ring_dtype — this step's gated units, stored
            # per head group so every ref access is full-lane-width
            # (Mosaic rejects some lane-offset ref reads of this buffer;
            # register-value slices at store time are free)
            u_vmem = refs[0]
            refs = refs[1:]
        if G > 1:
            # (1, NS) i32 — the step's input classes, staged through VMEM
            # so each head group reads its lanes as a REF load: Mosaic
            # cannot broadcast a register-sliced (1, NSg) row whose lane
            # offset is not a vreg-row multiple ("Invalid input layout"
            # on the one-hot compare), but ref loads at any 128-multiple
            # offset are fine
            clsrow_vmem = refs[0]
        toff = t0_ref[0, 0] if resume else 0

        if temperature > 0:
            pltpu.prng_seed(seed_ref[0, 0])

        if regularize != 0.0:
            # every column is the same penalty row, so one head-tile's
            # width serves all groups (and the whole row when G == 1)
            reg = (
                lax.broadcasted_iota(jnp.float32, (C, NSg), 0) - C / 2.0
            ) ** 2 * regularize
        else:
            reg = None

        def tap_slot(l):
            return (l % W) if W else l

        def tap_dma(l, j, t):
            # tap j of layer l looks back (nt - j) * d steps
            ridx = (t - (nt - j) * dil[l]) % periods[l]
            return pltpu.make_async_copy(
                ring_ref.at[pl.ds((ring_off[l] + ridx) * R, R), :],
                tap_vmem.at[pl.ds((tap_slot(l) * nt + j) * R, R), :],
                tap_sems.at[l * nt + j],
            )

        def issue_taps(l, t):
            for j in range(nt):
                @pl.when(t >= (nt - j) * dil[l])
                def _(l=l, j=j):
                    tap_dma(l, j, t).start()

        def write_dma(l, t):
            widx = t % periods[l]
            return pltpu.make_async_copy(
                h_vmem.at[pl.ds(tap_slot(l) * R, R), :],
                ring_ref.at[pl.ds((ring_off[l] + widx) * R, R), :],
                write_sems.at[l],
            )

        def fetch_prime_chunk(chunk):
            dma = pltpu.make_async_copy(
                prime_ref.at[pl.ds(chunk * _CHUNK, _CHUNK), :],
                prime_vmem,
                io_sem,
            )
            dma.start()
            dma.wait()

        fetch_prime_chunk(0)

        if Mp:
            # double-buffered per-step conditioning slab: slot t%2 holds
            # step t's rows; t+1 is prefetched while step t computes
            def cond_dma(t, slot):
                return pltpu.make_async_copy(
                    cond_ref.at[pl.ds(t * Mp, Mp), :],
                    cond_vmem.at[pl.ds(slot * Mp, Mp), :],
                    cond_sems.at[slot],
                )

            cond_dma(0, 0).start()

        def mm(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        def step(t, cls):  # cls: (1, NS) int32
            ta = t + toff  # absolute time: ring slots persist across calls
            # Tap reads for dilation-1 layers depend on the previous step's
            # write, so they are issued here; with prefetch enabled, taps
            # for d>=2 layers were issued at the END of the previous step
            # (their slot cannot be written in between — slot (t-d) mod
            # (d+1) != slot (t-1) mod (d+1) for d>=2), overlapping the
            # head+sampling compute. With a rotating window only the first
            # A layers' slots are free now; the rest issue during the walk.
            if W:
                for l in range(min(A, L)):
                    issue_taps(l, ta)
            else:
                for l in range(L):
                    if dil[l] == 1 or not prefetch:
                        issue_taps(l, ta)
                    elif resume:
                        # prefetch covers d>=2 taps from the PREVIOUS
                        # step — which does not exist for the first step
                        # of a resumed execution. Un-issued taps whose
                        # ta >= m wait-gates are open (every resumed
                        # chunk after the first: toff >= 2) deadlock the
                        # semaphore wait and the watchdog kills the
                        # device worker — found round 5 by the serving
                        # soak (the staged path always re-issues by
                        # absolute time and never had the bug; CPU
                        # interpret mode has no real semaphores, which
                        # is why four rounds of tests missed it).
                        @pl.when(t == 0)
                        def _(l=l):
                            issue_taps(l, ta)

            # embed: one-hot (C, NSg) per head tile, h = w_startT @ onehot
            if G > 1:
                clsrow_vmem[...] = cls

            def embed_group(g):
                cls_g = (
                    clsrow_vmem[:, g * NSg : (g + 1) * NSg] if G > 1 else cls
                )
                onehot = (
                    lax.broadcasted_iota(jnp.int32, (C, NSg), 0) == cls_g
                ).astype(jnp.float32)
                return mm(w_start_ref[...], onehot) + b_start_ref[...]

            h = jnp.concatenate(
                [embed_group(g) for g in range(G)], axis=1
            ) if G > 1 else embed_group(0)
            skip = None if skip_slab else jnp.zeros((S, NS), jnp.float32)

            if Mp:
                cond_dma(t, t % 2).wait()
                cond_cur = cond_vmem[pl.ds((t % 2) * Mp, Mp), :]  # (Mp, NS)

                @pl.when(t + 1 < total)
                def _():
                    cond_dma(t + 1, (t + 1) % 2).start()

            def z_extras(l, z):
                """State-only additions for layer l: ring-tap dots (waiting
                their DMAs just in time), conditioning, global conditioning —
                none depend on the current step's activation chain."""
                for j in range(nt):
                    m = (nt - j) * dil[l]  # this tap's lookback

                    @pl.when(ta >= m)
                    def _(l=l, j=j):
                        tap_dma(l, j, ta).wait()
                    tap = tap_vmem[pl.ds((tap_slot(l) * nt + j) * R, R), :]
                    zt = z + mm(w_old_ref[l, j], tap.astype(jnp.float32))
                    z = jnp.where(ta >= m, zt, z)
                if Mp:
                    z = z + mm(w_cond_ref[l], cond_cur)
                if has_gcond:
                    z = z + gproj_ref[pl.ds(l * 2 * D, 2 * D), :]
                return z

            def stage_write(l):
                # stage h and start the ring write; writes are awaited at
                # the end of the step (rotating window: when their slot
                # comes around again), before any slot can be re-read
                # (minimum lookback is 1 step). With bf16 rings the staged
                # copy rounds once here; in-register h stays f32 this step.
                if W and l >= W:
                    write_dma(l - W, ta).wait()  # slot l%W free again
                if quant:
                    # symmetric per-layer int8: round-to-nearest, clamp to
                    # +/-127 (the calibration margin makes clamping rare)
                    h_vmem[pl.ds(tap_slot(l) * R, R), :] = jnp.clip(
                        jnp.round(h * qscale_ref[l, 0]), -127.0, 127.0
                    ).astype(jnp.int8)
                else:
                    h_vmem[pl.ds(tap_slot(l) * R, R), :] = h.astype(
                        ring_dtype)
                write_dma(l, ta).start()

            def consume_unit(l, u, h, skip):
                """Layer l's gated unit feeds the skip path and the
                residual stream. Exact mode: one (S+R, D) dot, sequential
                skip accumulation. Slab mode: stage u and apply only the
                residual rows — the skip projection runs after the walk
                as one deep dot per head group (reassociated reduction,
                same caveat as fuse_res)."""
                if skip_slab:
                    us = u.astype(slab_dt)
                    for g in range(G):
                        u_vmem[g, pl.ds(l * D, D), :] = (
                            us[:, g * NSg : (g + 1) * NSg] if G > 1 else us
                        )
                    r = mm(w_out_ref[l], u) + b_out_ref[l]  # (R, NS)
                    return h + r, skip
                sr = mm(w_out_ref[l], u) + b_out_ref[l]  # (S+R, NS)
                return h + sr[S:, :], skip + sr[:S, :]

            if not fuse_res:
                for l in range(L):
                    stage_write(l)
                    z = z_extras(l, mm(w_cur_ref[l], h) + b_in_ref[l])
                    if W and l + A < L:
                        issue_taps(l + A, ta)
                    u = jnp.tanh(z[:D, :]) * jax.nn.sigmoid(z[D:, :])
                    h, skip = consume_unit(l, u, h, skip)
            else:
                # fuse_res: the serial layer chain is one dot per layer —
                #   z[l+1] = (w_cur[l+1] @ h[l] + bf[l] + extras[l+1])
                #            + wf[l] @ u[l]
                # with wf[l] = w_cur[l+1] @ w_res[l]^T pre-multiplied on
                # host. The h-dependent "pre" term, the tap/cond extras, and
                # the residual/skip updates all have a full layer of slack,
                # so only act -> dot(wf) chains layer to layer.
                z = z_extras(0, mm(w_cur_ref[0], h) + b_in_ref[0])
                for l in range(L):
                    stage_write(l)
                    if l + 1 < L:
                        pre = z_extras(
                            l + 1, mm(w_cur_ref[l + 1], h) + bf_ref[l]
                        )
                    if W and l + A < L:
                        issue_taps(l + A, ta)
                    u = jnp.tanh(z[:D, :]) * jax.nn.sigmoid(z[D:, :])
                    if l + 1 < L:
                        z = pre + mm(wf_ref[l], u)
                    h, skip = consume_unit(l, u, h, skip)

            def head_group(g):
                if skip_slab:
                    # f32-cast operands like the tap dots: the TPU matmul
                    # runs bf16 passes either way, and XLA:CPU (interpret
                    # mode) has no bf16 x bf16 dot
                    row = mm(
                        w_skipcat_ref[...].astype(jnp.float32),
                        u_vmem[g].astype(jnp.float32),
                    ) + b_skipsum_ref[...]
                else:
                    row = skip[:, g * NSg : (g + 1) * NSg]
                y = jnp.maximum(row, 0.0)
                y = jnp.maximum(
                    mm(w_end1_ref[...], y) + b_end1_ref[...], 0.0
                )
                logits = mm(w_end2_ref[...], y) + b_end2_ref[...]  # (C, NSg)
                if reg is not None:
                    logits = logits - reg

                def gumbel_noise():
                    # per-group draws: the PRNG stream assigns different
                    # bits to a lane than the untiled kernel would, so
                    # sampled rollouts match untiled statistically, not
                    # bitwise (temperature 0 stays bitwise)
                    bits = pltpu.bitcast(
                        pltpu.prng_random_bits((C, NSg)), jnp.uint32
                    )
                    bits24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
                    u01 = bits24.astype(jnp.float32) * (1.0 / (1 << 24))
                    u01 = jnp.clip(u01, 1e-7, 1.0 - 1e-7)
                    return -jnp.log(-jnp.log(u01))

                def hash_gumbel(t):
                    # Counter-based noise for the per-lane-temperature
                    # (serving) path: a murmur3-style finalizer over
                    # (step, class, lane, seed) in plain int32 ops — no
                    # pltpu PRNG, so it runs in interpret mode too. Greedy
                    # lanes ignore it; hot lanes get an independent-ish
                    # uniform per (step, class, lane).
                    sr = lax.shift_right_logical
                    if lane_seed:
                        # request-local counters: the draw depends only on
                        # (class, request-local step, request seed) — NOT
                        # on the lane index, stream width, head tile, or
                        # pool clock — so a hot request's rollout is
                        # bitwise identical solo or spliced into any lane
                        # pool at any admission time (give each request a
                        # distinct seed; equal seeds share noise)
                        idx = lax.broadcasted_iota(jnp.int32, (C, NSg), 0)
                        tloc = (t + toff) + toff_row_ref[
                            :, g * NSg : (g + 1) * NSg
                        ]
                        x = idx * jnp.int32(-1640531527)
                        x = x ^ (tloc * jnp.int32(-2048144789))
                        x = x ^ seed_row_ref[:, g * NSg : (g + 1) * NSg]
                    else:
                        idx = (
                            lax.broadcasted_iota(jnp.int32, (C, NSg), 0) * NS
                            + lax.broadcasted_iota(jnp.int32, (C, NSg), 1)
                            + g * NSg
                        )
                        x = idx * jnp.int32(-1640531527)  # golden-ratio mix
                        x = x ^ ((t + toff) * jnp.int32(-2048144789))
                        x = x ^ seed_ref[0, 0]
                    x = x ^ sr(x, 16)
                    x = x * jnp.int32(-2048144789)
                    x = x ^ sr(x, 13)
                    x = x * jnp.int32(-1028477387)
                    x = x ^ sr(x, 16)
                    u01 = sr(x, 8).astype(jnp.float32) * (1.0 / (1 << 24))
                    u01 = jnp.clip(u01, 1e-7, 1.0 - 1e-7)
                    return -jnp.log(-jnp.log(u01))

                if lane_temp:
                    tr = temp_ref[:, g * NSg : (g + 1) * NSg]  # (1, NSg)
                    drawn = jnp.argmax(
                        logits / jnp.maximum(tr, 1e-6) + hash_gumbel(t),
                        axis=0,
                    )
                    greedy = jnp.argmax(logits, axis=0)
                    s = jnp.where(tr[0] > 0, drawn, greedy)
                elif temperature > 0:
                    s = jnp.argmax(
                        logits / temperature + gumbel_noise(), axis=0
                    )
                else:
                    s = jnp.argmax(logits, axis=0)
                return s.astype(jnp.int32).reshape(1, NSg)

            sampled = jnp.concatenate(
                [head_group(g) for g in range(G)], axis=1
            ) if G > 1 else head_group(0)

            acc_vmem[pl.ds(t % _CHUNK, 1), :] = sampled

            @pl.when((t % _CHUNK == _CHUNK - 1) | (t == total - 1))
            def _flush():
                dma = pltpu.make_async_copy(
                    acc_vmem,
                    out_ref.at[pl.ds((t // _CHUNK) * _CHUNK, _CHUNK), :],
                    io_sem,
                )
                dma.start()
                dma.wait()

            # all ring writes must land before the next step reads them
            # (with a rotating window, layers < L-W were already drained
            # when their slot was reused)
            for l in range(max(0, L - W) if W else 0, L):
                write_dma(l, ta).wait()

            # prefetch next step's taps for d>=2 layers (see top of step;
            # a tap with lookback m can only collide with the previous
            # step's write when m == 1, i.e. d == 1)
            if prefetch:
                for l in range(L):
                    if dil[l] >= 2:
                        for j in range(nt):
                            @pl.when((ta + 1 >= (nt - j) * dil[l])
                                     & (t + 1 < total))
                            def _(l=l, j=j):
                                tap_dma(l, j, ta + 1).start()

            # next input
            if num_given > 1:
                in_prime = t + 1 < num_given

                @pl.when(in_prime & ((t + 1) % _CHUNK == 0))
                def _():
                    fetch_prime_chunk((t + 1) // _CHUNK)

                prime_row = prime_vmem[pl.ds((t + 1) % _CHUNK, 1), :]
                return jnp.where(in_prime, prime_row, sampled)
            return sampled

        lax.fori_loop(0, total, step, prime_vmem[pl.ds(0, 1), :])

    return kernel, periods


def generate_fast_batched(
    params: Params,
    cfg: WaveNetConfig,
    key: jax.Array,
    num_samples: int,
    first_samples: jnp.ndarray | None = None,
    temperature=1.0,
    regularize: float = 0.0,
    cond: jnp.ndarray | None = None,
    global_cond: jnp.ndarray | None = None,
    state: HbmGenState | None = None,
    return_state: bool = False,
    interpret: bool = False,
    ring_dtype=jnp.float32,
    fuse_res: bool = False,
    pad_streams: int | None = None,
    stage_layers: int | None = None,
    head_tiles: int | None = None,
    skip_slab: bool = False,
    lane_seed: jnp.ndarray | None = None,
    lane_clock: jnp.ndarray | None = None,
    ring_scales: jnp.ndarray | None = None,
):
    """Public entry — see :func:`_generate_fast_batched_jit` for the full
    contract. ``temperature`` may also be a per-stream ``(streams,)`` array
    (serving: requests at different temperatures share one batched rollout);
    lanes with temperature <= 0 take the greedy argmax branch, bitwise equal
    to a scalar temperature-0 rollout of that stream.

    ``lane_seed`` (``(streams,)`` int32) switches sampling noise to
    per-stream request-local counters: each draw depends only on (class,
    request-local step, that stream's seed), so a hot rollout is bitwise
    REPRODUCIBLE — identical for the same seed whether run solo or spliced
    into any lane pool at any admission time, any stream width, any
    head_tiles, any chunking. ``lane_clock`` (``(streams,)`` int32,
    default zeros) rebases the kernel clock to each stream's own step
    count (the continuous batcher sets it to local-minus-global at
    admission). Give concurrent requests distinct seeds — equal seeds draw
    equal noise. Implies the per-stream-temperature path (a scalar
    ``temperature`` is broadcast)."""
    if lane_clock is not None and lane_seed is None:
        raise ValueError("lane_clock only rebases the lane_seed noise "
                         "counters — pass lane_seed too")
    if lane_seed is not None and isinstance(temperature, (int, float)):
        streams = (
            state.cls.shape[0] if state is not None
            else jnp.atleast_2d(first_samples).shape[0]
            if first_samples is not None else 1
        )
        temperature = jnp.full((streams,), temperature, jnp.float32)
    if isinstance(temperature, (int, float)):
        return _generate_fast_batched_jit(
            params, cfg, key, num_samples, first_samples,
            temperature=float(temperature), regularize=regularize, cond=cond,
            global_cond=global_cond, state=state, return_state=return_state,
            interpret=interpret, ring_dtype=ring_dtype, fuse_res=fuse_res,
            pad_streams=pad_streams, stage_layers=stage_layers,
            head_tiles=head_tiles, skip_slab=skip_slab,
            ring_scales=ring_scales,
        )
    return _generate_fast_batched_jit(
        params, cfg, key, num_samples, first_samples,
        # scalar temperature is unreachable under lane_temp (and 0 keeps
        # the pltpu PRNG seeding out of the kernel — the lane path draws
        # its own counter-based noise, which also runs in interpret mode)
        temperature=0.0, regularize=regularize, cond=cond,
        global_cond=global_cond, state=state, return_state=return_state,
        interpret=interpret, ring_dtype=ring_dtype, fuse_res=fuse_res,
        pad_streams=pad_streams, stage_layers=stage_layers,
        head_tiles=head_tiles, skip_slab=skip_slab,
        ring_scales=ring_scales,
        lane_temp=jnp.asarray(temperature, jnp.float32),
        lane_seed=None if lane_seed is None
        else jnp.asarray(lane_seed, jnp.int32),
        lane_clock=None if lane_seed is None
        else jnp.zeros_like(jnp.asarray(lane_seed, jnp.int32))
        if lane_clock is None else jnp.asarray(lane_clock, jnp.int32),
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "num_samples", "temperature", "regularize",
                     "return_state", "interpret", "ring_dtype", "fuse_res",
                     "pad_streams", "stage_layers", "head_tiles",
                     "skip_slab"),
)
def _generate_fast_batched_jit(
    params: Params,
    cfg: WaveNetConfig,
    key: jax.Array,
    num_samples: int,
    first_samples: jnp.ndarray | None = None,
    temperature: float = 1.0,
    regularize: float = 0.0,
    cond: jnp.ndarray | None = None,
    global_cond: jnp.ndarray | None = None,
    state: HbmGenState | None = None,
    return_state: bool = False,
    interpret: bool = False,
    ring_dtype=jnp.float32,
    fuse_res: bool = False,
    pad_streams: int | None = None,
    stage_layers: int | None = None,
    head_tiles: int | None = None,
    skip_slab: bool = False,
    ring_scales: jnp.ndarray | None = None,
    lane_temp: jnp.ndarray | None = None,
    lane_seed: jnp.ndarray | None = None,
    lane_clock: jnp.ndarray | None = None,
):
    """Batched fused generation with HBM queue state. Same contract as
    ``models.generate.generate_fast``, including local conditioning:
    ``cond`` is ``(streams, total, cond_channels)`` with row t conditioning
    step t (the vocoder path — per step one (M, NS) slab is DMAed in,
    double-buffered, and applied as a third K=M matmul per layer).
    ``global_cond`` ``(streams, gcond_channels)`` is constant per stream, so
    it is pre-projected on host to a per-layer (2D, NS) add table that
    stays VMEM-resident — zero per-step cost (VMEM: L*2D*NS*4 bytes;
    at very high stream counts prefer folding speaker identity into cond).

    Streaming: with ``return_state`` the call also returns an
    :class:`HbmGenState`; passing it back (``first_samples=None``)
    continues without re-priming — the ring buffer is aliased into the
    next call's output, so chunk boundaries cost no state copies and the
    chunked rollout equals a single shot bitwise at temperature 0.

    The HBM DMA slices need lane alignment, so the kernel runs at a
    multiple of 128 streams internally; any other count is **auto-padded**
    with dummy lanes (streams are fully independent — every matmul here is
    lane-pointwise across streams, so padding changes nothing for the real
    lanes and stream count is nearly free until VMEM staging runs out, see
    PERF.md). Outputs are sliced back to the caller's count; a returned
    ``HbmGenState`` keeps the padded ring (its ``cls`` is sliced) and
    resuming from it re-pads transparently. ``pad_streams`` overrides the
    alignment multiple (interpret mode defaults to no padding so tests can
    run tiny counts; pass e.g. ``pad_streams=8`` to exercise the padding
    path there). Any kernel_size works — each of the k-1 lookback taps
    gets its own DMA slot and K=R matmul.

    ``ring_dtype=jnp.bfloat16`` stores the ring buffers and the tap/
    activation staging in bf16: halves the per-step DMA traffic and the
    VMEM staging footprint (the VMEM ceiling on stream count), at one
    rounding of the residual stream per layer per step. Matmuls still
    accumulate in f32. Needs residual_channels % 16 == 0 on hardware
    (bf16 sublane tile); rollouts are no longer bitwise vs the f32-ring
    kernel but stay within bf16 rounding at the logits level.

    ``fuse_res=True`` shortens the serial per-layer chain to ONE matmul
    (same rewrite as the VMEM kernel's flag): the next layer's gate input
    becomes ``z[l+1] = w_cur[l+1] @ h[l] + (w_cur[l+1] @ w_res[l]^T) @ u[l]
    + ...`` with the weight product pre-multiplied on host, so only
    ``act -> dot`` chains layer to layer and the tap/cond adds ride the
    slack. Mathematically identical but floating-point-reassociated:
    logits agree to ~1e-5 with the exact path, so argmax rollouts can
    diverge on near-ties — the default stays exact.

    ``stage_layers=W`` (>= 4) switches the tap/activation VMEM staging to a
    W-layer rotating window instead of all-L slabs: staging VMEM drops from
    ``2*L*R*NS`` to ``2*W*R*NS`` elements, which is what caps the stream
    count (the all-L slabs overflow VMEM near 4096 bf16 streams on the
    40-layer config). Tap DMAs are issued W-2 layers ahead of their
    consumer and ring writes drain when their slot is reused, so the extra
    synchronization stays off the serial chain; results are bitwise
    identical to the unstaged kernel. Costs the cross-step tap prefetch
    (irrelevant at high stream counts, where DMAs hide under the wide
    matmuls) — leave it ``None`` for small batches.

    ``head_tiles=G`` runs the embed/head/sampling block (one-hot embed,
    relu -> end convs -> logits -> categorical draw) in G groups of
    streams/G lanes. The block is lane-pointwise across streams, so its
    live intermediates — the relu'd (S, NS) skip row, the (E, NS) hidden
    row and three (C, NS)-class buffers — shrink by G, which is what caps
    stream count on wide-head (chaconne-class) configs once the ring
    staging is windowed. Temperature-0 rollouts are bitwise identical to
    the untiled kernel; sampled rollouts draw the same distribution from
    a differently-laned PRNG stream. Needs streams % (128*G) == 0.

    ``skip_slab=True`` defers the skip projection out of the layer walk:
    each layer's gated unit is staged into a ``(L*D, streams)`` slab
    (ring_dtype) and the skip row is computed per head group as ONE
    ``(S, L*D) @ (L*D, NSg)`` matmul — the same fused-skip rewrite the
    training trunk uses (models/wavenet.py fuse_skip). Two effects: the
    MXU stops wasting ~4x of every pass on K=D=32 tiles against the
    (S+R)-row output weight (~3x fewer MXU passes on the dominant matmul
    for chaconne-class heads), and the full-width (S, streams) f32 skip
    accumulator — the VMEM ceiling on wide-skip stream counts — is
    replaced by the slab (bf16 under bf16 rings). The skip reduction is
    reassociated (one K=L*D dot instead of L sequential adds), so like
    ``fuse_res`` the rollout is no longer bitwise vs the exact path;
    logits agree to f32/bf16 rounding. Composes with staging, head tiles,
    fuse_res, conditioning, and streaming state."""
    fuse_res = fuse_res and cfg.num_layers > 1
    resume = state is not None
    fill = cfg.classes // 2
    if resume:
        if first_samples is not None:
            raise ValueError("pass either first_samples or state, not both")
        # the ring carries the kernel's (possibly padded) lane count; cls
        # carries the caller's — re-pad the dummy lanes' next-input class
        true_streams = state.cls.shape[0]
        streams = state.ring.shape[1]
        if streams < true_streams:
            raise ValueError(
                f"state ring width {streams} < stream count {true_streams}"
            )
        first_samples = jnp.pad(
            state.cls.astype(jnp.int32), (0, streams - true_streams),
            constant_values=fill,
        ).reshape(streams, 1)
        num_given = 1
    else:
        if first_samples is None:
            first_samples = jnp.full((1, 1), fill, jnp.int32)
        first_samples = jnp.atleast_2d(first_samples).astype(jnp.int32)
        true_streams, num_given = first_samples.shape
        align = pad_streams if pad_streams is not None else (
            None if interpret else 128
        )
        streams = true_streams
        if align and streams % align:
            streams += -streams % align
            first_samples = jnp.pad(
                first_samples, ((0, streams - true_streams), (0, 0)),
                constant_values=fill,
            )
    assert interpret or streams % 128 == 0 or pad_streams is not None
    rdt = jnp.dtype(ring_dtype)
    if rdt.itemsize == 2 and cfg.residual_channels % 16 != 0 and not interpret:
        raise ValueError(
            f"ring_dtype {rdt.name} needs residual_channels % 16 == 0 "
            f"(sublane tile of 2-byte types), got {cfg.residual_channels}"
        )
    quant = rdt.itemsize == 1
    if quant:
        # experimental int8 rings: halves the dominant ring DMA again on
        # the DMA-bound small-channel configs (docs/PERF.md round-5 row).
        # Symmetric per-layer quantization; dequant folds into w_old so
        # the serial walk gains only the store's round/clip.
        if rdt != jnp.dtype(jnp.int8):
            raise ValueError(f"1-byte ring_dtype must be int8, got {rdt}")
        if cfg.residual_channels % 32 and not interpret:
            raise ValueError(
                "int8 rings need residual_channels % 32 == 0 (sublane "
                f"tile of 1-byte types), got {cfg.residual_channels}"
            )
        if ring_scales is None:
            raise ValueError(
                "int8 rings need per-layer ring_scales — calibrate with "
                "calibrate_ring_scales(); chunked calls must reuse the "
                "SAME scales (the ring persists across chunks)"
            )
        qscales = jnp.asarray(ring_scales, jnp.float32).reshape(
            cfg.num_layers, 1)
    total = num_given - 1 + num_samples

    L = cfg.num_layers
    R, D, S, E, C = (
        cfg.residual_channels, cfg.dilation_channels, cfg.skip_channels,
        cfg.end_channels, cfg.classes,
    )
    f32 = jnp.float32
    lp = params["layers"]

    # transposed weights: (out_ch, in_ch) for channels-first matmuls
    k_sz = cfg.kernel_size
    w_in = lp["w_in"].astype(f32)  # (L, k, R, 2D)
    w_old = jnp.swapaxes(w_in[:, : k_sz - 1], 2, 3)  # (L, k-1, 2D, R)
    if quant:
        # fold the per-layer dequant (|h|_max / 127) into the tap weights:
        # the kernel's tap matmul then consumes raw int8 counts cast to
        # f32 (exact in the MXU's bf16 operand rounding — ints <= 127)
        w_old = w_old * (qscales[:, None, :, None] / 127.0)
    w_cur = jnp.swapaxes(w_in[:, k_sz - 1], 1, 2)  # (L, 2D, R)
    b_in = lp.get("b_in", jnp.zeros((L, 2 * D))).astype(f32)[:, :, None]
    if skip_slab:
        # residual-only per-layer dot; the skip weights concatenate into
        # one (S, L*D) matrix (col l*D+d matches slab row l*D+d) applied
        # after the walk, with the per-layer skip biases pre-summed
        w_out_t = jnp.swapaxes(lp["w_res"].astype(f32), 1, 2)  # (L, R, D)
        b_out = lp.get("b_res", jnp.zeros((L, R))).astype(f32)[:, :, None]
        # the slab weight stores in ring_dtype: under bf16 rings that
        # halves a (S, L*D) VMEM resident (~4 MB for chaconne) at zero
        # extra rounding — the platform's matmul multiplies operands in
        # bf16 passes regardless, and the slab operand is already rdt
        slab_rdt = rdt if rdt.itemsize >= 2 else jnp.dtype(jnp.bfloat16)
        w_skipcat = (
            lp["w_skip"].astype(f32).reshape(L * D, S).T.astype(slab_rdt)
        )  # (S, L*D)
        b_skipsum = jnp.sum(
            lp.get("b_skip", jnp.zeros((L, S))).astype(f32), axis=0
        )[:, None]  # (S, 1)
    else:
        w_out = jnp.concatenate(
            [lp["w_skip"].astype(f32), lp["w_res"].astype(f32)], axis=2
        )  # (L, D, S+R)
        w_out_t = jnp.swapaxes(w_out, 1, 2)  # (L, S+R, D)
        b_out = jnp.concatenate(
            [
                lp.get("b_skip", jnp.zeros((L, S))).astype(f32),
                lp.get("b_res", jnp.zeros((L, R))).astype(f32),
            ],
            axis=1,
        )[:, :, None]

    # prime rows: step i lives in row i
    n_prime_chunks = -(-num_given // _CHUNK)
    prime_rows = jnp.pad(
        first_samples, ((0, 0), (0, n_prime_chunks * _CHUNK - num_given))
    ).T  # (chunks*_CHUNK, S)

    args = [
        jax.random.randint(key, (1, 1), 0, np.iinfo(np.int32).max, jnp.int32),
        prime_rows,
        params["start"]["w"].astype(f32).T,  # (R, C)
        params["start"].get("b", jnp.zeros((R,))).reshape(R, 1).astype(f32),
        w_cur,
        w_old,
        b_in,
        w_out_t,
        b_out,
        params["end1"]["w"].astype(f32).T,  # (E, S)
        params["end1"]["b"].reshape(E, 1).astype(f32),
        params["end2"]["w"].astype(f32).T,  # (C, E)
        params["end2"]["b"].reshape(C, 1).astype(f32),
    ]
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args)
    in_specs[1] = pl.BlockSpec(memory_space=pl.ANY)  # prime stays in HBM

    if quant:
        args.append(127.0 / qscales)  # (L, 1) store scale
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    if skip_slab:
        args.extend([w_skipcat, b_skipsum])
        in_specs.extend([pl.BlockSpec(memory_space=pltpu.VMEM)] * 2)

    if lane_temp is not None:
        if lane_temp.shape != (true_streams,):
            raise ValueError(
                f"per-stream temperature shape {lane_temp.shape} != "
                f"({true_streams},)"
            )
        # dummy pad lanes run greedy (temp 0) — cheapest branch
        args.append(
            jnp.pad(
                lane_temp.astype(f32), (0, streams - true_streams)
            ).reshape(1, streams)
        )
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    if lane_seed is not None:
        if lane_temp is None:
            raise ValueError("lane_seed needs per-stream temperature "
                             "(the counter-noise sampling path)")
        for name, row in (("lane_seed", lane_seed), ("lane_clock",
                                                     lane_clock)):
            if row is None or row.shape != (true_streams,):
                raise ValueError(
                    f"{name} must be ({true_streams},) int32, got "
                    f"{None if row is None else row.shape}"
                )
        for row in (lane_seed, lane_clock):
            args.append(
                jnp.pad(
                    row.astype(jnp.int32), (0, streams - true_streams)
                ).reshape(1, streams)
            )
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    if fuse_res:
        # chain weights: wf[l] = w_cur[l+1] @ w_res[l]^T  (2D, D), and the
        # folded bias bf[l] = w_cur[l+1] @ b_res[l] + b_in[l+1]
        w_res = lp["w_res"].astype(f32)  # (L, D, R)
        b_res = lp.get("b_res", jnp.zeros((L, R))).astype(f32)
        args.append(jnp.einsum("lcr,ldr->lcd", w_cur[1:], w_res[:-1]))
        args.append(
            jnp.einsum("lcr,lr->lc", w_cur[1:], b_res[:-1])[:, :, None]
            + b_in[1:]
        )
        in_specs.extend([pl.BlockSpec(memory_space=pltpu.VMEM)] * 2)

    Mp = 0
    if cond is not None:
        M = cfg.cond_channels
        if M == 0:
            raise ValueError("cond given but cfg.cond_channels == 0")
        if cond.shape != (true_streams, total, M):
            raise ValueError(
                f"cond shape {cond.shape} != (streams, num_given-1+num_samples,"
                f" cond_channels) = {(true_streams, total, M)}"
            )
        if streams != true_streams:
            cond = jnp.pad(cond, ((0, streams - true_streams), (0, 0), (0, 0)))
        Mp = -(-M // 8) * 8  # sublane-align each per-step slab
        # (streams, total, M) -> (total, Mp, streams) -> (total*Mp, streams)
        cond_cf = jnp.transpose(cond.astype(f32), (1, 2, 0))
        cond_cf = jnp.pad(cond_cf, ((0, 0), (0, Mp - M), (0, 0)))
        args.append(cond_cf.reshape(total * Mp, streams))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # HBM
        # (L, M, 2D) -> (L, 2D, Mp) transposed + padded to match the slab
        w_cond = jnp.swapaxes(lp["w_cond"].astype(f32), 1, 2)
        args.append(jnp.pad(w_cond, ((0, 0), (0, 0), (0, Mp - M))))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    if global_cond is not None:
        if cfg.gcond_channels == 0:
            raise ValueError("global_cond given but cfg.gcond_channels == 0")
        if global_cond.shape != (true_streams, cfg.gcond_channels):
            raise ValueError(
                f"global_cond shape {global_cond.shape} != "
                f"{(true_streams, cfg.gcond_channels)}"
            )
        if streams != true_streams:
            global_cond = jnp.pad(
                global_cond, ((0, streams - true_streams), (0, 0))
            )
        # channels-first per-layer add table: rows [l*2D, (l+1)*2D)
        gproj = jnp.einsum(
            "sg,lgd->lds", global_cond.astype(f32), lp["w_gcond"].astype(f32)
        ).reshape(L * 2 * D, streams)
        args.append(gproj)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    io_aliases = {}
    if resume:
        args.append(state.t.astype(jnp.int32).reshape(1, 1))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        # ring input aliased onto ring output (output index 1): the state
        # stays in place in HBM, no copy at chunk boundaries
        io_aliases[len(args)] = 1
        args.append(state.ring.astype(rdt))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))

    if head_tiles and streams % (head_tiles * (1 if interpret else 128)):
        raise ValueError(
            f"head_tiles={head_tiles} needs streams divisible into "
            f"lane-aligned groups; got {streams} streams"
        )
    kernel, periods = _make_kernel(
        cfg, streams, num_given, total, float(temperature), float(regularize),
        cond_rows=Mp, has_gcond=global_cond is not None, resume=resume,
        ring_dtype=rdt, fuse_res=fuse_res, stage_layers=stage_layers,
        head_tiles=head_tiles, lane_temp=lane_temp is not None,
        lane_seed=lane_seed is not None, skip_slab=skip_slab,
        quant=quant,
    )
    n_chunks = -(-total // _CHUNK)

    nt = k_sz - 1
    Wd = min(stage_layers, L) if stage_layers else L
    scratch_shapes = [
        pltpu.VMEM((Wd * nt * R, streams), rdt),
        pltpu.VMEM((Wd * R, streams), rdt),
        pltpu.VMEM((_CHUNK, streams), jnp.int32),
        pltpu.VMEM((_CHUNK, streams), jnp.int32),
        pltpu.SemaphoreType.DMA((L * nt,)),
        pltpu.SemaphoreType.DMA((L,)),
        pltpu.SemaphoreType.DMA,
    ]
    if Mp:
        scratch_shapes.append(pltpu.VMEM((2 * Mp, streams), f32))
        scratch_shapes.append(pltpu.SemaphoreType.DMA((2,)))
    if skip_slab:
        scratch_shapes.append(
            pltpu.VMEM(
                (head_tiles or 1, L * D, streams // (head_tiles or 1)),
                rdt if rdt.itemsize >= 2 else jnp.bfloat16,
            )
        )
    if (head_tiles or 1) > 1:
        # the per-step input-class row, staged so head groups can ref-load
        # their lane slice (see clsrow_vmem in the kernel)
        scratch_shapes.append(pltpu.VMEM((1, streams), jnp.int32))

    out, ring = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_chunks * _CHUNK, streams), jnp.int32),
            jax.ShapeDtypeStruct((sum(periods) * R, streams), rdt),
        ),
        scratch_shapes=scratch_shapes,
        input_output_aliases=io_aliases,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # Mosaic's default scoped-VMEM cap (~16 MB) is below the chip's
            # physical VMEM; the explicit cap is what unlocks the widest
            # stream counts (chaconne 4096 bf16 needs ~24 MB of slabs +
            # staging). Same override the training trunk kernel uses.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)

    # dummy pad lanes (if any) are dropped here; the ring keeps them so a
    # resumed call re-enters the kernel at the same aligned width
    all_cls = out.T[:true_streams]  # (true_streams, n_chunks*_CHUNK)
    cls = all_cls[:, num_given - 1 : total]  # (true_streams, num_samples)
    wav = mu_law_expansion_jnp(
        (cls.astype(jnp.float32) / cfg.classes) * 2.0 - 1.0, cfg.classes
    )
    if not return_state:
        return wav, cls
    t0 = state.t if resume else jnp.zeros((), jnp.int32)
    new_state = HbmGenState(
        ring=ring, t=t0 + total, cls=all_cls[:, total - 1]
    )
    return wav, cls, new_state


def calibrate_ring_scales(
    params: Params,
    cfg: WaveNetConfig,
    key: jax.Array,
    first_samples: jnp.ndarray,
    num_samples: int = 256,
    margin: float = 1.05,
    **kwargs,
):
    """Per-layer ``|h|`` scales for int8 rings (``ring_dtype=jnp.int8``).

    Runs a short bf16-ring rollout and takes each layer's max ``|ring|``
    over its final period window — a recent-history sample across all
    calibration streams. The rollout must WRITE every ring slot (taps are
    predicated, slots start uninitialized), so the calibration clip needs
    ``num_given - 1 + num_samples >= (k-1)*max_dilation + 1``; a full
    receptive-field prime always satisfies this.

    Chunked generation must reuse ONE calibration for the life of the ring
    (the int8 state persists across chunks at these scales).
    """
    total = jnp.atleast_2d(first_samples).shape[1] - 1 + num_samples
    max_period = (cfg.kernel_size - 1) * cfg.max_dilation + 1
    if total < max_period:
        raise ValueError(
            f"calibration needs >= {max_period} total steps to write every "
            f"ring slot, got {total} — prime with a receptive-field window"
        )
    kwargs.setdefault("temperature", 0.0)  # greedy: also runs in interpret
    _, _, st = generate_fast_batched(
        params, cfg, key, num_samples, first_samples,
        ring_dtype=jnp.bfloat16, return_state=True, **kwargs,
    )
    periods = [(cfg.kernel_size - 1) * d + 1 for d in cfg.dilations]
    off = np.cumsum([0] + periods)
    R = cfg.residual_channels
    ring = np.abs(np.asarray(st.ring, np.float32))
    scales = np.maximum(
        [ring[off[l] * R : (off[l] + periods[l]) * R].max()
         for l in range(cfg.num_layers)],
        1e-3,
    ) * margin
    return jnp.asarray(scales, jnp.float32)
