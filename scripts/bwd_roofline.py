#!/usr/bin/env python
"""Backward trunk-kernel roofline (VERDICT r4 #1).

Itemizes ``fused_trunk``'s forward and backward pass structure — per-layer
MXU passes at the pair-stacked (128,128) geometry, FLOPs, VPU elementwise
ops, and HBM DMA bytes, all over the per-layer time-window staircase — and
prints the ideal phase times against v5e ceilings next to measured numbers
(from ``train_phase_bench.py``'s profiler attribution).

Model (see ops/pallas/trunk_kernel.py docstring): every matmul with
M, K <= 128 costs ~W cycles of one MXU column walk along the time axis —
v5e distributes the N(time) axis over its MXUs, so a pass is W/n_mxu
cycles regardless of how much of the (128,128) tile M and K fill. The
K=W weight-grad contractions cost the same W-walk. FLOPs below count the
*executed* dense products (pair-stacked block-diagonal zeros included
where the MXU actually multiplies them), so TFLOP/s here is comparable
to the gen-kernel rooflines in docs/PERF.md.

Usage:  python scripts/bwd_roofline.py --config chaconne_wide --batch 16
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# pure geometry — no device work; keep it off the TPU tunnel
os.environ.setdefault("WAVENET_TPU_FORCE_CPU", "1")

import jax  # noqa: E402

if os.environ.get("WAVENET_TPU_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

# v5e single-chip ceilings (jax-ml.github.io/scaling-book numbers)
MXU_PEAK = 197e12        # bf16 FLOP/s (f32 matmuls run bf16 passes here)
HBM_BW = 819e9           # bytes/s
CLOCK = 1.5e9            # effective: MXU_PEAK = 2*128*128*4*CLOCK
N_MXU = 4
VPU_OPS = 6e12           # f32 elementwise lanes/s (8x128 * 4 ALUs * clock)
TRANS_COST = 8           # tanh/sigmoid ~8 VPU slots each


def itemize(cfg, out_len, B, save_dtype_bytes=2, out_dtype_bytes=2):
    from pytorch_wavenet_tpu.ops.pallas.trunk_kernel import (
        _geometry,
        _windows,
        _use_dma_out,
    )

    T, P, Tp, OFF = _geometry(cfg, out_len)
    s_l, sp_l = _windows(cfg, out_len)
    k, R, D, L = (cfg.kernel_size, cfg.residual_channels,
                  cfg.dilation_channels, cfg.num_layers)
    G = 2 if (B % 2 == 0 and 2 * D * 2 <= 128 and k * R * 2 <= 128
              and cfg.cond_channels == 0) else 1
    NG = B // G
    GR, GD = G * R, G * D
    Ws = [Tp - s for s in s_l]
    Wps = [Tp - sp for sp in sp_l]
    sumW, sumWp = sum(Ws), sum(Wps)
    sdt_bytes = jnp.dtype(cfg.stream_dtype).itemsize

    def t_mxu_walk(n_walks_W):
        # one (<=128, <=128) matmul over W lanes = W/N_MXU cycles
        return NG * n_walks_W / N_MXU / CLOCK

    # ---- forward ----
    fwd = {}
    # MXU: gated (2GD x GkR)@W + residual (GR x GD)@W per layer
    fwd["mxu_walks"] = 2 * sumW
    fwd["mxu_s"] = t_mxu_walk(2 * sumW)
    fwd["flops"] = NG * sum(
        2 * W * (2 * GD * G * k * R + GR * GD) for W in Ws
    )
    # VPU: tap copies (k-1 of (GR,W)), tanh+sig+mul (2GD+GD rows), mask,
    # residual add+cast (GR), v current copy (GR)
    fwd["vpu_ops"] = NG * sum(
        W * (GR * k + 2 * GD * TRANS_COST + GD * 2 + GR * 2) for W in Ws
    )
    fwd["vpu_s"] = fwd["vpu_ops"] / VPU_OPS
    # DMA: h0 load (GR,Tp) f32; hsave store (GR,Wp) save_dtype; u window
    # store (GD,out) out_dtype
    fwd["dma_bytes"] = NG * (
        GR * Tp * 4
        + save_dtype_bytes * GR * sumWp
        + out_dtype_bytes * L * GD * out_len
    )
    fwd["dma_s"] = fwd["dma_bytes"] / HBM_BW

    # ---- backward ----
    bwd = {}
    # MXU per layer: recompute-z (W) + du=wrt@dh (W) + dWz K=W (W) +
    # dWr K=W (W) + dv=wzt@dz (W)
    bwd["mxu_walks"] = 5 * sumW
    bwd["mxu_s"] = t_mxu_walk(5 * sumW)
    bwd["flops"] = NG * sum(
        2 * W * (
            2 * GD * G * k * R      # recompute z
            + GD * GR               # du (wrt)
            + 2 * GD * G * k * R    # dWz
            + GR * GD               # dWr
            + G * k * R * 2 * GD    # dv (wzt)
        ) for W in Ws
    )
    # VPU: tap recompose (GR*k), tanh+sig (2GD transcendental), u/mask
    # (2GD), dz compose (4 muls on GD rows -> 4GD), du place+mask (2GD),
    # reductions dzs/dhs (2GD+GR), dh place-adds (k*(GR)) on Wp, writeback
    bwd["vpu_ops"] = NG * (
        sum(W * (GR * k + 2 * GD * TRANS_COST + 2 * GD + 4 * GD
                 + 2 * GD + 2 * GD + GR) for W in Ws)
        + sum(Wp * (k * GR + GR) for Wp in Wps)
    )
    bwd["vpu_s"] = bwd["vpu_ops"] / VPU_OPS
    # DMA: hsave load (GR,Wp); duo load (GD,out); dh0 store (GR,Tp) f32;
    # weight grads flush once (tiny)
    bwd["dma_bytes"] = NG * (
        save_dtype_bytes * GR * sumWp
        + out_dtype_bytes * L * GD * out_len
        + GR * Tp * 4 * 2  # dhbuf zeros init + final store, f32
    )
    bwd["dma_s"] = bwd["dma_bytes"] / HBM_BW

    geo = dict(T=T, P=P, Tp=Tp, OFF=OFF, G=G, NG=NG, sumW=sumW,
               sumWp=sumWp, L=L, avgW=sumW / L)
    return geo, fwd, bwd


def report(name, d, measured_ms=None):
    ideal = max(d["mxu_s"], d["vpu_s"], d["dma_s"]) * 1e3
    bound = max(("MXU", d["mxu_s"]), ("VPU", d["vpu_s"]),
                ("DMA", d["dma_s"]), key=lambda t: t[1])[0]
    line = (f"  {name:<10} MXU {d['mxu_s']*1e3:6.3f} ms | "
            f"VPU {d['vpu_s']*1e3:6.3f} ms | DMA {d['dma_s']*1e3:6.3f} ms "
            f"({d['dma_bytes']/1e6:6.1f} MB) -> ideal {ideal:6.3f} ms "
            f"[{bound}-bound]")
    if measured_ms:
        line += (f"  measured {measured_ms:.3f} ms = {ideal/measured_ms:5.1%}"
                 f" of ideal, {d['flops']/measured_ms*1e3/1e12:5.1f} TFLOP/s"
                 f", {d['dma_bytes']/measured_ms*1e3/1e9:5.0f} GB/s")
    print(line)
    return ideal


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="chaconne_wide")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--measured-fwd", type=float, default=None,
                    help="profiler kernel-fwd ms/step to compare")
    ap.add_argument("--measured-bwd", type=float, default=None)
    args = ap.parse_args()

    import pytorch_wavenet_tpu as wt

    cfg = wt.get_config(args.config)
    geo, fwd, bwd = itemize(cfg, cfg.output_length, args.batch)
    print(f"{args.config} B={args.batch} out={cfg.output_length}: "
          f"G={geo['G']} NG={geo['NG']} Tp={geo['Tp']} "
          f"avg window {geo['avgW']:.0f} of {geo['Tp']} lanes "
          f"({geo['avgW']/geo['Tp']:.0%})")
    print(f"  fwd: {fwd['mxu_walks']} MXU W-walks/program "
          f"({fwd['flops']/1e9:.1f} GFLOP total), "
          f"bwd: {bwd['mxu_walks']} walks ({bwd['flops']/1e9:.1f} GFLOP) "
          f"-> pass ratio {bwd['mxu_walks']/fwd['mxu_walks']:.2f}")
    report("kernel fwd", fwd, args.measured_fwd)
    report("kernel bwd", bwd, args.measured_bwd)


if __name__ == "__main__":
    main()
