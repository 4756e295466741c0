"""Fused multi-layer training trunk (VMEM-resident residual stream).

The XLA training trunk (models/wavenet.py:262-315) is a serial chain of L
small matmuls (K=R=32 for the chaconne family): between layers the (N, T, R)
residual stream round-trips HBM, and at ~16 FLOPs/byte the chain is
bandwidth-bound (~10-35 TFLOP/s effective, docs/PERF.md). This kernel applies
the generation kernels' discipline (ops/pallas/gen_kernel_hbm.py) to
*training*: a whole residual stream lives in VMEM as a channels-first
``(C, time)`` tile while all L layers walk over it, so the only HBM traffic
per layer is the bf16 activation save the backward needs plus the gated-unit
output window.

Measured cost structure (TPU v5e): an MXU matmul pass costs ~N/(#MXUs)
cycles along the time axis *independent of M and K* below 128, and the
VPU/VMEM traffic of the tap shifts and elementwise tail is comparable to
the matmul time. Four levers shape the kernel:

* channels-first ``(C, time)`` — R=32 rows are dense sublanes (the
  channels-last alternative pads 32 lanes to 128 and wastes 4x VMEM);
* the ``k`` dilated taps and the current sample fuse into ONE matmul: the
  K axis is ``[h, shift(h, d), ...]`` stacked in sublanes (K = k*R);
* **pair stacking** (``G = 2`` batch items per grid program): weights are
  block-diagonal over the pair, so the gated matmul becomes a single dense
  M=2*2D=128, K=2*k*R=128 pass per TWO items. Output rows are ordered
  ``[f_a, f_b, g_a, g_b]`` so the gated nonlinearity needs no row shuffles.
  Block-diagonal zeros contribute exact 0.0 to the f32 accumulation, so
  stacking is bitwise equivalent to the unstacked walk;
* **per-layer time windows**: layer l only ever influences the loss through
  gated units at positions >= ``s_l`` (the output window minus the receptive
  field still ahead of it), so every matmul, shift, and elementwise op runs
  on the ``[s_l, Tp)`` lane slice — ~24% of the lane-work vanishes for the
  chaconne geometry, symmetrically in the backward.

The time axis is front-padded with ``P >= (k-1)*max_dilation`` zero lanes: a
dilated tap is then a *static lane shift* of the in-VMEM stream, and the pad
region doubles as the reference's zero history (reference:
wavenet_modules.py:23-27 zero-pads dilate() the same way). ``P`` is rounded
so the output window starts lane-aligned. The grid iterates over item pairs
(TPU grids are sequential): Pallas double-buffers the stream-in blocks
across programs, so pair g+1's loads ride under pair g's layer walk.

The kernel returns every layer's gated units ``u`` — the trunk's only
externally-visible activations (the final residual output is discarded,
reference: wavenet_model.py:154-165) — and the skip projection + head stay
in XLA, where the big K=L*D matmuls already run compute-bound. When
``out_len`` is a lane multiple (the wide training configs) the per-layer
(GD, out) unit windows stream to HBM through a small double-buffered DMA
stage instead of a pipelined VMEM output block — an (L, GD, out) block at
chaconne_wide geometry is ~8 MB and would not fit VMEM twice over; for
small ``out_len`` the VMEM block is cheap and DMA lane alignment would not
hold, so the block path is kept.

Backward (``fused_trunk`` is a ``jax.custom_vjp``): the forward saves each
layer's *input* stream window to HBM (bf16 by default — halves traffic;
matmuls re-accumulate in f32), and the backward walks layers in reverse per
pair, recomputing z/tanh/sigmoid from the saved stream (cheaper than saving
(2D, T) pre-activations) and accumulating weight grads in VMEM across the
whole grid; the pair's shared-weight gradient blocks are sliced out of one
deep K=time contraction and summed. Gradients match ``jax.grad`` of the
XLA trunk to matmul precision (exactly, when ``save_dtype`` is f32).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import WaveNetConfig

_LANE = 128


def _geometry(cfg: WaveNetConfig, out_len: int):
    """(T, P, Tp, OFF): input window length, front pad, padded lanes, and
    the lane offset of the output window. P >= the deepest lookback so
    every tap reads in-buffer zeros for pre-history, and P is chosen so
    OFF = P + T - out_len is a lane multiple (aligned (D, out) slices).
    Tp additionally rounds up to a lane multiple (trailing zero pad):
    the hsave DMA slices [sp, Tp) need 128-multiple widths, and trailing
    lanes are harmless — they model time past the clip, are causally
    unreadable by any output lane, and receive zero gradient (tap grads
    only shift earlier in time)."""
    T = cfg.receptive_field + out_len - 1
    maxshift = (cfg.kernel_size - 1) * cfg.max_dilation
    P = maxshift + (-(maxshift + T - out_len) % _LANE)
    OFF = P + T - out_len
    Tp = P + T + (-(P + T) % _LANE)
    return T, P, Tp, OFF


def _windows(cfg: WaveNetConfig, out_len: int):
    """Per-layer compute windows. ``s[l]``: layer l's gated unit is only
    needed on lanes ``[s[l], Tp)`` (the output window, widened going down
    by each deeper layer's lookback; 128-aligned). ``sp[l] = s[l-1]``: the
    window of layer l's *input* stream the backward must see (what the
    forward saves)."""
    T, P, Tp, OFF = _geometry(cfg, out_len)
    k = cfg.kernel_size
    dil = cfg.dilations
    L = cfg.num_layers
    s = [0] * L
    s[L - 1] = OFF
    for l in range(L - 1, 0, -1):
        s[l - 1] = max(0, (s[l] - (k - 1) * dil[l]) // _LANE * _LANE)
    sp = [max(0, (s[l] - (k - 1) * dil[l]) // _LANE * _LANE)
          for l in range(L)]
    return s, sp


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _mm_t(a, b):
    """(p, W) x (q, W) -> (p, q): contraction over the (lane) time axis —
    the weight-gradient shape, K = W is MXU-deep."""
    return lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _place(x, lead, width, dtype):
    """Embed ``x`` (rows, w) into a (rows, width) frame at column ``lead``
    (zeros elsewhere) — all static shapes."""
    parts = []
    if lead > 0:
        parts.append(jnp.zeros((x.shape[0], lead), dtype))
    parts.append(x.astype(dtype))
    trail = width - lead - x.shape[1]
    if trail > 0:
        parts.append(jnp.zeros((x.shape[0], trail), dtype))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _use_dma_out(out_len: int) -> bool:
    """Stream per-layer unit windows to HBM via manual DMA when the slice
    is lane-aligned (the wide configs whose (L, GD, out) block would blow
    VMEM); keep the pipelined VMEM block for small windows."""
    return out_len % _LANE == 0


# --------------------------------------------------------------- kernels


def _make_fwd_kernel(cfg: WaveNetConfig, out_len: int, G: int, sdt,
                     save_dtype, out_dtype, save: bool, Mp: int = 0):
    L, k, R, D = (cfg.num_layers, cfg.kernel_size, cfg.residual_channels,
                  cfg.dilation_channels)
    dil = cfg.dilations
    T, P, Tp, OFF = _geometry(cfg, out_len)
    s_l, sp_l = _windows(cfg, out_len)
    GR, GD = G * R, G * D
    dma_out = _use_dma_out(out_len)
    # NOTE (round-5 measured negative): saving the stream by DMAing
    # DIRECTLY from ``hbuf`` (no staging cast-copy, a fence before the
    # residual update) is SLOWER on hardware — fwd 0.486 -> 0.701 ms at
    # f32 saves, 0.524 ms at bf16 stream+saves (chaconne_wide) — the
    # same-layer fence gives the copy only ~1.2 us of matmul cover, vs
    # the staged path's two-layer window. The staged bf16 save already
    # moves at ~full HBM bandwidth (116 MB adding only 0.12 ms); bytes,
    # not issue count, are its cost (grouped-DMA and full-width variants
    # measured no better). See docs/PERF.md round-5 bwd roofline.

    def kernel(*refs):
        it = iter(refs)
        h0_ref, wz_ref, wr_ref, bi_ref, br_ref = (
            next(it) for _ in range(5)
        )
        if Mp:
            # local conditioning: the (G*Mp, Tp) channels-first timeline
            # block plus the per-layer (2GD, G*Mp) projection — one extra
            # dense pass per layer, off the serial chain's critical ops
            cond_ref, wc_ref = next(it), next(it)
        uout_ref = next(it)
        hsave_ref = next(it) if save else None
        hbuf, v = next(it), next(it)
        if dma_out:
            ustage, usems = next(it), next(it)
        if save:
            stage, sems = next(it), next(it)
        n = pl.program_id(0)
        hbuf[:] = h0_ref[0]

        def save_dma(l):
            sp = sp_l[l]
            return pltpu.make_async_copy(
                stage.at[l % 2, :, sp:], hsave_ref.at[n, l, :, sp:],
                sems.at[l % 2],
            )

        def uout_dma(l):
            return pltpu.make_async_copy(
                ustage.at[l % 2], uout_ref.at[n, l], usems.at[l % 2]
            )

        for l in range(L):
            d = dil[l]
            s = s_l[l]
            W = Tp - s
            if save:
                # stage the layer-input window for the backward pass; the
                # DMA drains when its slot is reused two layers later
                sp = sp_l[l]
                if l >= 2:
                    save_dma(l - 2).wait()
                stage[l % 2, :, sp:] = hbuf[:, sp:].astype(save_dtype)
                save_dma(l).start()

            # gated pre-activation: ONE dense pass — K stacks the current
            # sample and every dilated tap for the whole pair, windowed to
            # the lanes this layer can still influence
            v[:GR, s:] = hbuf[:, s:]
            for j in range(k - 1):
                m = (k - 1 - j) * d
                # lanes [s, m) would read before the buffer; they are pad
                # lanes (m <= P) whose gated unit is masked below — zero
                # them (scratch may hold stale values; NaN*0 != 0)
                lo = max(s, m)
                if lo > s:
                    v[GR * (j + 1) : GR * (j + 2), s:lo] = jnp.zeros(
                        (GR, lo - s), sdt
                    )
                v[GR * (j + 1) : GR * (j + 2), lo:] = hbuf[
                    :, lo - m : Tp - m
                ]
            z = _mm(wz_ref[l], v[:, s:]) + bi_ref[:, l : l + 1]  # (2GD, W)
            if Mp:
                z = z + _mm(wc_ref[l], cond_ref[0, :, s:])
            # row order [f_0..f_{G-1}, g_0..g_{G-1}]: the split is clean
            u = jnp.tanh(z[:GD]) * jax.nn.sigmoid(z[GD:])
            if s < P:
                # zero the front-pad lanes: they are every deeper layer's
                # zero history and must stay exactly zero
                mask = (
                    lax.broadcasted_iota(jnp.int32, (1, W), 1) + s >= P
                ).astype(jnp.float32)
                u = u * mask
                rb = br_ref[:, l : l + 1] * mask
            else:
                rb = br_ref[:, l : l + 1]
            uwin = u[:, OFF - s : OFF - s + out_len].astype(out_dtype)
            if dma_out:
                if l >= 2:
                    uout_dma(l - 2).wait()
                ustage[l % 2] = uwin
                uout_dma(l).start()
            else:
                uout_ref[0, l] = uwin
            hbuf[:, s:] = (
                hbuf[:, s:].astype(jnp.float32) + _mm(wr_ref[l], u) + rb
            ).astype(sdt)

        for l in range(max(0, L - 2), L):
            if save:
                save_dma(l).wait()
            if dma_out:
                uout_dma(l).wait()

    return kernel, (T, P, Tp, OFF)


def _make_bwd_kernel(cfg: WaveNetConfig, out_len: int, G: int, sdt,
                     save_dtype, out_dtype, Mp: int = 0):
    L, k, R, D = (cfg.num_layers, cfg.kernel_size, cfg.residual_channels,
                  cfg.dilation_channels)
    dil = cfg.dilations
    T, P, Tp, OFF = _geometry(cfg, out_len)
    s_l, sp_l = _windows(cfg, out_len)
    GR, GD = G * R, G * D
    dma_out = _use_dma_out(out_len)
    # direct loads: with save_dtype == stream dtype there is no cast
    # between the saved stream and the tap buffer, so the prefetch DMA
    # writes the double-buffered tap buffer's current-rows block directly
    # and the per-layer (GR, W) stage->v copy disappears. Unlike the
    # forward's rejected direct-save variant (see the note in
    # _make_fwd_kernel), the load side keeps its two-layer prefetch
    # window, so this measures neutral-to-slightly-better on hardware
    # (0.908 vs 0.925 ms at chaconne_wide bf16 stream).
    direct = jnp.dtype(save_dtype) == jnp.dtype(sdt)

    def kernel(*refs):
        it = iter(refs)
        duo_ref, hsave_ref, wz_ref, wr_ref, bi_ref, wzt_ref, wrt_ref = (
            next(it) for _ in range(7)
        )
        if Mp:
            cond_ref, wc_ref, wct_ref = (next(it) for _ in range(3))
        dh0_ref, dwz_ref, dwr_ref, dbi_ref, dbr_ref = (
            next(it) for _ in range(5)
        )
        if Mp:
            dwc_ref, dcond_ref = next(it), next(it)
        if direct:
            dhbuf, v2, sems = (next(it) for _ in range(3))
        else:
            dhbuf, v, stage, sems = (next(it) for _ in range(4))
        if dma_out:
            dustage, dusems = next(it), next(it)
        if Mp:
            dcbuf = next(it)  # (G*Mp, Tp) f32 — dcond accumulator
        n = pl.program_id(0)

        @pl.when(n == 0)
        def _init():
            dwz_ref[:] = jnp.zeros((L, 2 * D, k * R), jnp.float32)
            dwr_ref[:] = jnp.zeros((L, R, D), jnp.float32)
            dbi_ref[:] = jnp.zeros((2 * D, L), jnp.float32)
            dbr_ref[:] = jnp.zeros((R, L), jnp.float32)
            if Mp:
                dwc_ref[:] = jnp.zeros((L, 2 * D, Mp), jnp.float32)

        def load_dma(l):
            sp = sp_l[l]
            if direct:
                return pltpu.make_async_copy(
                    hsave_ref.at[n, l, :, sp:], v2.at[l % 2, :GR, sp:],
                    sems.at[l % 2],
                )
            return pltpu.make_async_copy(
                hsave_ref.at[n, l, :, sp:], stage.at[l % 2, :, sp:],
                sems.at[l % 2],
            )

        def duo_dma(l):
            return pltpu.make_async_copy(
                duo_ref.at[n, l], dustage.at[l % 2], dusems.at[l % 2]
            )

        load_dma(L - 1).start()
        if dma_out:
            duo_dma(L - 1).start()
            if L >= 2:
                duo_dma(L - 2).start()
        dhbuf[:] = jnp.zeros((GR, Tp), jnp.float32)
        if Mp:
            dcbuf[:] = jnp.zeros((G * Mp, Tp), jnp.float32)

        for l in range(L - 1, -1, -1):
            d = dil[l]
            s = s_l[l]
            W = Tp - s
            load_dma(l).wait()
            if l > 0:
                load_dma(l - 1).start()
            dh_next = dhbuf[:, s:]  # grad w.r.t. this layer's output stream

            # recompute the gated unit from the saved input-stream window
            if direct:
                # current rows arrived straight off the load DMA; build
                # the shifted tap rows in place from them
                for j in range(k - 1):
                    m = (k - 1 - j) * d
                    lo = max(s, m)
                    if lo > s:
                        v2[l % 2, GR * (j + 1) : GR * (j + 2), s:lo] = (
                            jnp.zeros((GR, lo - s), sdt)
                        )
                    v2[l % 2, GR * (j + 1) : GR * (j + 2), lo:] = v2[
                        l % 2, :GR, lo - m : Tp - m
                    ]
                vw = v2[l % 2, :, s:]
            else:
                v[:GR, s:] = stage[l % 2, :, s:].astype(sdt)
                for j in range(k - 1):
                    m = (k - 1 - j) * d
                    # same clamp as the forward: lanes [s, m) are masked
                    lo = max(s, m)
                    if lo > s:
                        v[GR * (j + 1) : GR * (j + 2), s:lo] = jnp.zeros(
                            (GR, lo - s), sdt
                        )
                    v[GR * (j + 1) : GR * (j + 2), lo:] = stage[
                        l % 2, :, lo - m : Tp - m
                    ].astype(sdt)
                vw = v[:, s:]
            z = _mm(wz_ref[l], vw) + bi_ref[:, l : l + 1]
            if Mp:
                z = z + _mm(wc_ref[l], cond_ref[0, :, s:])
            a = jnp.tanh(z[:GD])
            sg = jax.nn.sigmoid(z[GD:])
            if s < P:
                mask = (
                    lax.broadcasted_iota(jnp.int32, (1, W), 1) + s >= P
                ).astype(jnp.float32)
            else:
                mask = None
            u = a * sg if mask is None else a * sg * mask

            # du: through the residual projection, plus the skip-path
            # cotangent placed at the (lane-aligned) output window
            du = _mm(wrt_ref[l], dh_next)  # (GD, W)
            if dma_out:
                duo_dma(l).wait()
                duo = dustage[l % 2].astype(jnp.float32)
                if l >= 2:
                    duo_dma(l - 2).start()
            else:
                duo = duo_ref[0, l].astype(jnp.float32)  # (GD, out)
            du = du + _place(duo, OFF - s, W, jnp.float32)
            if mask is not None:
                du = du * mask
            dz = jnp.concatenate(
                [du * sg * (1.0 - a * a), du * a * (sg * (1.0 - sg))],
                axis=0,
            )  # (2GD, W); masked because du is

            # weight grads: one deep K=W contraction per product; the
            # pair's shared-weight blocks are sliced out and summed
            # (cross-pair blocks are discarded — the price of the dense
            # stacked pass, half the product for G=2)
            dWz = _mm_t(dz, vw)           # (2GD, G*k*R)
            dWr = _mm_t(dh_next, u)       # (GR, GD)
            dzs = jnp.sum(dz, axis=1, keepdims=True)        # (2GD, 1)
            dhm = dh_next if mask is None else dh_next * mask
            dhs = jnp.sum(dhm, axis=1, keepdims=True)       # (GR, 1)
            dwz_acc = jnp.zeros((2 * D, k * R), jnp.float32)
            dwr_acc = jnp.zeros((R, D), jnp.float32)
            dbi_acc = jnp.zeros((2 * D, 1), jnp.float32)
            dbr_acc = jnp.zeros((R, 1), jnp.float32)
            for i in range(G):
                # item i: f rows D*i, g rows GD + D*i; h cols R*i (+ GR
                # per tap group); residual rows R*i
                fr, gr = D * i, GD + D * i
                dwz_acc += jnp.concatenate(
                    [
                        jnp.concatenate(
                            [dWz[fr : fr + D,
                                 GR * j + R * i : GR * j + R * i + R]
                             for j in range(k)], axis=1),
                        jnp.concatenate(
                            [dWz[gr : gr + D,
                                 GR * j + R * i : GR * j + R * i + R]
                             for j in range(k)], axis=1),
                    ], axis=0,
                )
                dwr_acc += dWr[R * i : R * i + R, D * i : D * i + D]
                dbi_acc += jnp.concatenate(
                    [dzs[fr : fr + D], dzs[gr : gr + D]], axis=0
                )
                dbr_acc += dhs[R * i : R * i + R]
            dwz_ref[l] += dwz_acc
            dwr_ref[l] += dwr_acc
            dbi_ref[:, l : l + 1] += dbi_acc
            dbr_ref[:, l : l + 1] += dbr_acc
            if Mp:
                # conditioning grads: the projection weight (per-item
                # blocks summed, like dWz) and the timeline itself (the
                # learnable upsampler differentiates through cond)
                dWc = _mm_t(dz, cond_ref[0, :, s:])  # (2GD, G*Mp)
                dwc_acc = jnp.zeros((2 * D, Mp), jnp.float32)
                for i in range(G):
                    fr, gr = D * i, GD + D * i
                    dwc_acc += jnp.concatenate(
                        [dWc[fr : fr + D, Mp * i : Mp * i + Mp],
                         dWc[gr : gr + D, Mp * i : Mp * i + Mp]], axis=0)
                dwc_ref[l] += dwc_acc
                dcbuf[:, s:] = dcbuf[:, s:] + _mm(wct_ref[l], dz)

            # input grad on the widened frame [sp, Tp): identity (residual)
            # + the gate paths, taps shifting grad back in time
            sp = sp_l[l]
            dv = _mm(wzt_ref[l], dz)  # (G*k*R, W)
            dh = dhbuf[:, sp:] + _place(dv[:GR], s - sp, Tp - sp,
                                        jnp.float32)
            for j in range(k - 1):
                m = (k - 1 - j) * d
                # dz at global lane q sends tap grad to lane q - m. Lanes
                # that would land before the buffer came from the forward's
                # zero-filled [s, m) clamp (masked anyway) — drop them.
                lo = max(s - m, 0)
                drop = lo - (s - m)
                dh = dh + _place(
                    dv[GR * (j + 1) : GR * (j + 2), drop:],
                    lo - sp, Tp - sp, jnp.float32,
                )
            dhbuf[:, sp:] = dh

        dh0_ref[0] = dhbuf[:]
        if Mp:
            dcond_ref[0] = dcbuf[:]

    return kernel, (T, P, Tp, OFF)


# ------------------------------------------------------------ host glue


def _stacked_weights(params, cfg: WaveNetConfig, G: int, has_cond: bool):
    """Per-item weight views in the kernel's fused layout (differentiable;
    a tuple so custom_vjp cotangents mirror it 1:1).

    * ``wcat (L, 2D, k*R)``: fused gate matmul, col blocks
      ``[current | tap_0 | tap_1 ...]`` (tap j looks back (k-1-j)*d).
    * ``wr1 (L, R, D)``: residual 1x1, channels-first.
    * ``bi1 (L, 2D)``, ``br1 (L, R)``.
    * with conditioning: ``wc1 (L, 2D, M)`` — the local-conditioning 1x1,
      channels-first.
    """
    L, k, R, D = (cfg.num_layers, cfg.kernel_size, cfg.residual_channels,
                  cfg.dilation_channels)
    lp = params["layers"]
    f32 = jnp.float32
    w_in = lp["w_in"].astype(f32)                      # (L, k, R, 2D)
    wcat = jnp.concatenate(
        [jnp.swapaxes(w_in[:, k - 1], 1, 2)]
        + [jnp.swapaxes(w_in[:, j], 1, 2) for j in range(k - 1)],
        axis=2,
    )  # (L, 2D, k*R)
    wr1 = jnp.swapaxes(lp["w_res"].astype(f32), 1, 2)  # (L, R, D)
    bi1 = lp.get("b_in", jnp.zeros((L, 2 * D))).astype(f32)
    br1 = lp.get("b_res", jnp.zeros((L, R))).astype(f32)
    if has_cond:
        wc1 = jnp.swapaxes(lp["w_cond"].astype(f32), 1, 2)  # (L, 2D, M)
        return (wcat, wr1, bi1, br1, wc1)
    return (wcat, wr1, bi1, br1)


def _expand_stacked(wpack, cfg: WaveNetConfig, G: int, Mp: int, sdt):
    """Expand per-item weights to the kernel's block-diagonal stacked form
    via pure broadcasting (no scatters — this runs every train step).
    Row order of wz: [f_0..f_{G-1}, g_0..g_{G-1}]; col order: tap group
    outer, item middle, channel inner. Biases are laid out lanes-over-
    layers — ``bi (2GD, L)`` / ``br (GR, L)`` — so their VMEM tiles are
    dense (an (L, C, 1) layout pads every 1-lane column to 128). The
    conditioning weight pads its M cols to the sublane-aligned ``Mp``.
    Runs under jit; its transpose (the pair gradient summation) is
    hand-written in the custom VJP."""
    L, k, R, D = (cfg.num_layers, cfg.kernel_size, cfg.residual_channels,
                  cfg.dilation_channels)
    wcat, wr1, bi1, br1 = wpack[:4]
    f32 = jnp.float32
    eye = jnp.eye(G, dtype=f32)
    # (L, 2, D, k, R): split f/g rows and tap-group cols
    w6 = wcat.reshape(L, 2, D, k, R)
    wz = (
        eye[None, None, :, None, None, :, None]
        * w6[:, :, None, :, :, None, :]
    ).reshape(L, G * 2 * D, G * k * R)
    wr = (
        eye[None, :, None, :, None]
        * wr1[:, None, :, None, :]
    ).reshape(L, G * R, G * D)
    bi = jnp.concatenate(
        [jnp.tile(bi1[:, :D], (1, G)), jnp.tile(bi1[:, D:], (1, G))], axis=1
    ).T  # (2GD, L)
    br = jnp.tile(br1, (1, G)).T  # (GR, L)
    out = [wz.astype(sdt), wr.astype(sdt), bi.astype(f32), br.astype(f32)]
    if Mp:
        wc1 = wpack[4]  # (L, 2D, M)
        M = wc1.shape[2]
        wc1 = jnp.pad(wc1, ((0, 0), (0, 0), (0, Mp - M)))
        wcexp = (
            eye[None, None, :, None, None, :, None]
            * wc1.reshape(L, 2, D, 1, Mp)[:, :, None, :, :, None, :]
        ).reshape(L, G * 2 * D, G * Mp)
        out.append(wcexp.astype(sdt))
    return out


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def _trunk(wpack, h0p, condp, cfg, out_len, G, Mp, sdt, save_dtype,
           out_dtype, interpret):
    u, _ = _trunk_fwd_call(wpack, h0p, condp, cfg, out_len, G, Mp, sdt,
                           save_dtype, out_dtype, interpret, save=False)
    return u


def _trunk_fwd_call(wpack, h0p, condp, cfg, out_len, G, Mp, sdt, save_dtype,
                    out_dtype, interpret, save):
    kernel, (T, P, Tp, OFF) = _make_fwd_kernel(
        cfg, out_len, G, sdt, save_dtype, out_dtype, save, Mp=Mp
    )
    NG = h0p.shape[0]  # number of pair programs
    L, k, R, D = (cfg.num_layers, cfg.kernel_size, cfg.residual_channels,
                  cfg.dilation_channels)
    GR, GD = G * R, G * D
    dma_out = _use_dma_out(out_len)
    exp = _expand_stacked(wpack, cfg, G, Mp, sdt)
    wz, wr, bi, br = exp[:4]
    args = [h0p.astype(sdt), wz, wr, bi, br]
    in_specs = [
        pl.BlockSpec((1, GR, Tp), lambda n: (n, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
    if Mp:
        args += [condp.astype(sdt), exp[4]]
        in_specs += [
            pl.BlockSpec((1, G * Mp, Tp), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
    out_shape = [jax.ShapeDtypeStruct((NG, L, GD, out_len), out_dtype)]
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY) if dma_out else
        pl.BlockSpec((1, L, GD, out_len), lambda n: (n, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    scratch = [
        pltpu.VMEM((GR, Tp), sdt),
        pltpu.VMEM((G * k * R, Tp), sdt),
    ]
    if dma_out:
        scratch += [
            pltpu.VMEM((2, GD, out_len), out_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    if save:
        out_shape.append(
            jax.ShapeDtypeStruct((NG, L, GR, Tp), save_dtype)
        )
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch += [
            pltpu.VMEM((2, GR, Tp), save_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    res = pl.pallas_call(
        kernel,
        grid=(NG,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return (res[0], res[1] if save else None)


def _trunk_fwd(wpack, h0p, condp, cfg, out_len, G, Mp, sdt, save_dtype,
               out_dtype, interpret):
    u, hsave = _trunk_fwd_call(wpack, h0p, condp, cfg, out_len, G, Mp, sdt,
                               save_dtype, out_dtype, interpret, save=True)
    return u, (wpack, condp, hsave)


def _trunk_bwd(cfg, out_len, G, Mp, sdt, save_dtype, out_dtype, interpret,
               res, du):
    wpack, condp, hsave = res
    kernel, (T, P, Tp, OFF) = _make_bwd_kernel(cfg, out_len, G, sdt,
                                               save_dtype, out_dtype, Mp=Mp)
    NG = hsave.shape[0]
    L, k, R, D = (cfg.num_layers, cfg.kernel_size, cfg.residual_channels,
                  cfg.dilation_channels)
    GR, GD = G * R, G * D
    f32 = jnp.float32
    dma_out = _use_dma_out(out_len)
    exp = _expand_stacked(wpack, cfg, G, Mp, sdt)
    wz, wr, bi, br = exp[:4]
    wzt = jnp.swapaxes(wz, 1, 2)  # (L, G*k*R, G*2D)
    wrt = jnp.swapaxes(wr, 1, 2)  # (L, G*D, G*R)

    def cidx2(n):
        return (0, 0)

    def cidx3(n):
        return (0, 0, 0)

    args = [du, hsave, wz, wr, bi, wzt, wrt]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY) if dma_out else
        pl.BlockSpec((1, L, GD, out_len), lambda n: (n, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # hsave
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
    if Mp:
        wcexp = exp[4]
        args += [condp.astype(sdt), wcexp, jnp.swapaxes(wcexp, 1, 2)]
        in_specs += [
            pl.BlockSpec((1, G * Mp, Tp), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
    out_specs = [
        pl.BlockSpec((1, GR, Tp), lambda n: (n, 0, 0),
                     memory_space=pltpu.VMEM),
        # weight grads: constant-index blocks accumulated across the
        # whole grid, flushed to HBM once at the last program
        pl.BlockSpec((L, 2 * D, k * R), cidx3, memory_space=pltpu.VMEM),
        pl.BlockSpec((L, R, D), cidx3, memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * D, L), cidx2, memory_space=pltpu.VMEM),
        pl.BlockSpec((R, L), cidx2, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((NG, GR, Tp), f32),
        jax.ShapeDtypeStruct((L, 2 * D, k * R), f32),
        jax.ShapeDtypeStruct((L, R, D), f32),
        jax.ShapeDtypeStruct((2 * D, L), f32),
        jax.ShapeDtypeStruct((R, L), f32),
    ]
    if Mp:
        out_specs += [
            pl.BlockSpec((L, 2 * D, Mp), cidx3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * Mp, Tp), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((L, 2 * D, Mp), f32),
            jax.ShapeDtypeStruct((NG, G * Mp, Tp), f32),
        ]
    if jnp.dtype(save_dtype) == jnp.dtype(sdt):  # direct loads
        scratch = [
            pltpu.VMEM((GR, Tp), f32),
            pltpu.VMEM((2, G * k * R, Tp), sdt),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        scratch = [
            pltpu.VMEM((GR, Tp), f32),
            pltpu.VMEM((G * k * R, Tp), sdt),
            pltpu.VMEM((2, GR, Tp), save_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    if dma_out:
        scratch += [
            pltpu.VMEM((2, GD, out_len), du.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    if Mp:
        scratch.append(pltpu.VMEM((G * Mp, Tp), f32))
    res_out = pl.pallas_call(
        kernel,
        grid=(NG,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    dh0p, dwcat, dwr1, dbi, dbr = res_out[:5]
    # cotangents in wpack's per-item layout, and for (h0p, condp)
    dwpack = [dwcat, dwr1, dbi.T, dbr.T]
    dcondp = None
    if Mp:
        dwc, dcondp = res_out[5], res_out[6]
        M = wpack[4].shape[2]
        dwpack.append(dwc[:, :, :M])
    return tuple(dwpack), dh0p.astype(jnp.float32), dcondp


_trunk.defvjp(_trunk_fwd, _trunk_bwd)


def fused_trunk(
    params,
    cfg: WaveNetConfig,
    h0: jnp.ndarray,
    out_len: int,
    *,
    cond: jnp.ndarray | None = None,
    save_dtype=jnp.bfloat16,
    out_dtype=None,
    raw: bool = False,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Run the residual trunk through the fused Pallas kernel.

    ``h0``: the embedded input stream ``(N, T, R)`` (from
    :func:`models.wavenet.embed_inputs`), ``T = receptive_field + out_len - 1``.
    Returns every layer's gated units over the output window as
    ``(N, out_len, L*D)`` — exactly the concatenation the fused-skip path
    feeds to the (L*D, S) skip matmul (models/wavenet.py:310-315) — or,
    with ``raw=True``, the kernel's native ``(N/G, L, G, D, out_len)``
    layout so the caller can contract it with ``dot_general`` directly
    (the (N, out, L*D) relayout materializes a (N*out*L*D) buffer both
    forward and backward; the skip projection doesn't need it).

    ``cond``: optional local conditioning ``(N, T, cond_channels)`` —
    the vocoder training path. It rides as a channels-first per-pair VMEM
    block; each layer adds one (2GD, G*M) pass, and the backward also
    emits d(cond) (the learnable upsampler differentiates through it).

    Differentiable w.r.t. ``params``, ``h0`` and ``cond`` via a custom VJP
    whose backward is a second Pallas kernel (reverse layer walk per item
    pair, recompute from the bf16-saved stream, in-VMEM weight-grad
    accumulation).

    ``cfg.stream_dtype`` governs the in-VMEM stream/tap buffers (bfloat16
    halves the kernel's dominant VMEM traffic; matmuls still accumulate
    f32 — same contract as the XLA trunk's knob).
    ``save_dtype``: dtype of the per-layer stream saves the backward reads
    (bf16 default; use f32 for bitwise-tight gradient checks).
    ``out_dtype``: gated-unit output dtype (default f32; bf16 halves the
    output block's VMEM/HBM cost and feeds the platform's bf16 matmuls).
    """
    N, T, R = h0.shape
    if cfg.kernel_size < 2:
        raise ValueError("fused_trunk needs kernel_size >= 2")
    if interpret is None:
        # Mosaic compiles on TPU only; everywhere else (the CPU test env)
        # the kernel runs interpreted, same as the generation kernels
        interpret = jax.default_backend() != "tpu"
    Texp, P, Tp, OFF = _geometry(cfg, out_len)
    if T != Texp:
        raise ValueError(
            f"h0 length {T} != receptive_field + out_len - 1 = {Texp}"
        )
    D, k = cfg.dilation_channels, cfg.kernel_size
    # pair stacking only while the stacked gated matmul still fits one MXU
    # tile (beyond that G=2 doubles VMEM for zero MXU saving), and not
    # with conditioning (the cond block + grads already crowd VMEM at
    # vocoder widths)
    G = 2 if (N % 2 == 0 and 2 * D * 2 <= _LANE and k * R * 2 <= _LANE
              and cond is None) else 1
    sdt = jnp.dtype(cfg.stream_dtype)
    out_dtype = jnp.dtype(out_dtype or jnp.float32)
    # channels-first + front zero pad (the kernel's static-shift history)
    # + trailing pad to a lane multiple (see _geometry); pairs stack in
    # sublanes: program n holds items (G*n .. G*n+G-1)
    h0p = jnp.pad(
        jnp.swapaxes(h0.astype(jnp.float32), 1, 2),
        ((0, 0), (0, 0), (P, Tp - P - T)),
    ).reshape(N // G, G * R, Tp)
    condp = None
    Mp = 0
    if cond is not None:
        if cond.shape[:2] != (N, T):
            raise ValueError(
                f"cond shape {cond.shape} must be (N, T, M) = ({N}, {T}, M)"
            )
        M = cond.shape[2]
        Mp = -(-M // 16) * 16  # sublane-align for 2-byte stream dtypes too
        condp = jnp.pad(
            jnp.swapaxes(cond.astype(jnp.float32), 1, 2),
            ((0, 0), (0, Mp - M), (P, Tp - P - T)),
        ).reshape(N // G, G * Mp, Tp)
    wpack = _stacked_weights(params, cfg, G, has_cond=cond is not None)
    u = _trunk(wpack, h0p, condp, cfg, out_len, G, Mp, sdt,
               jnp.dtype(save_dtype), out_dtype, interpret)
    L = cfg.num_layers
    u = u.reshape(N // G, L, G, D, out_len)
    if raw:
        return u
    # (N/G, L, G*D, out) -> (N, out, L*D): un-stack the pair, then put
    # layers*channels last
    return jnp.transpose(u, (0, 2, 4, 1, 3)).reshape(N, out_len, L * D)
