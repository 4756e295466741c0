#!/usr/bin/env python
"""Full benchmark sweep (the headline single number lives in bench.py).

Measures, on the current device:
  * training step time + audio-seconds/s (chaconne config, batch 16 — the
    reference's canonical training run, train_script.py:82)
  * single-stream generation: XLA scan path and fused Pallas kernel
  * multi-stream generation throughput (batch 64/256 streams)
  * host data-pipeline batch gather rate
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, reps=3):
    fn()  # compile/warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from pytorch_wavenet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # restarts reload compiled programs from disk
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="chaconne")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--gen-samples", type=int, default=16384)
    p.add_argument("--hbm-kernel-only", action="store_true",
                   help="reduce the HBM sweep's outputs on device (download "
                   "a scalar, not the waveform) — isolates kernel "
                   "throughput from the host link, which otherwise "
                   "dominates at thousands of streams")
    args = p.parse_args()

    import pytorch_wavenet_tpu as wt
    from pytorch_wavenet_tpu.ops.pallas.gen_kernel import generate_fast_fused
    from pytorch_wavenet_tpu.training.trainer import train_step
    from pytorch_wavenet_tpu.utils.profiling import trunk_flops

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    cfg = wt.get_config(args.config)
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    print(f"platform={platform} config={args.config} rf={cfg.receptive_field} "
          f"params={cfg.parameter_count():,}")

    # ---------------- training step
    B = args.batch_size
    tx = wt.reference_adam(1e-4)
    opt_state = tx.init(params)
    x = jax.random.randint(jax.random.PRNGKey(1), (B, cfg.item_length), 0, cfg.classes)
    y = jax.random.randint(jax.random.PRNGKey(2), (B, cfg.output_length), 0, cfg.classes)

    # copies: train_step donates its inputs, and params is reused below
    p = jax.tree_util.tree_map(jnp.array, params)
    o = opt_state
    p, o, loss, _ = train_step(p, o, cfg, tx, x, y)  # compile
    np.asarray(loss)
    # amortize over chained steps: a single dispatch through the device
    # tunnel costs ~25 ms regardless of compute, so per-step timing must
    # pipeline dispatches and sync once at the end
    N = 20
    t0 = time.perf_counter()
    for _ in range(N):
        p, o, loss, _ = train_step(p, o, cfg, tx, x, y)
    np.asarray(loss)
    dt = (time.perf_counter() - t0) / N
    flops = 3 * trunk_flops(cfg, B)  # fwd + ~2x bwd
    audio_sec_per_s = B * cfg.output_length / 16000.0 / dt
    print(f"train step (B={B}): {dt*1e3:.2f} ms  "
          f"[{flops/dt/1e12:.2f} TFLOP/s est, {audio_sec_per_s:.3f} audio-s/s "
          f"@ output_length={cfg.output_length}]")

    # ---------------- generation
    n = args.gen_samples
    prime = jax.random.randint(
        jax.random.PRNGKey(3), (1, cfg.receptive_field), 0, cfg.classes
    )

    def gen_xla():
        wav, _ = wt.generate_fast(
            params, cfg, jax.random.PRNGKey(5), n, prime, temperature=1.0
        )
        np.asarray(wav)

    dt = timed(gen_xla, reps=2)
    print(f"gen XLA 1-stream: {n/dt:,.0f} samples/s ({dt*1e6/(n+cfg.receptive_field):.1f} us/step)")

    if on_tpu:
        def gen_fused():
            wav, _ = generate_fast_fused(
                params, cfg, jax.random.PRNGKey(5), n, prime, temperature=1.0
            )
            np.asarray(wav)

        dt = timed(gen_fused, reps=2)
        print(f"gen fused 1-stream: {n/dt:,.0f} samples/s "
              f"({dt*1e6/(n+cfg.receptive_field):.2f} us/step, "
              f"{n/dt/16000:.2f}x realtime)")

        def gen_fused_res():
            wav, _ = generate_fast_fused(
                params, cfg, jax.random.PRNGKey(5), n, prime,
                temperature=1.0, fuse_res=True
            )
            np.asarray(wav)

        dt = timed(gen_fused_res, reps=2)
        print(f"gen fused 1-stream (fuse_res): {n/dt:,.0f} samples/s "
              f"({dt*1e6/(n+cfg.receptive_field):.2f} us/step, "
              f"{n/dt/16000:.2f}x realtime)")

    for S in (64, 256):
        primeS = jnp.tile(prime, (S, 1))
        nS = max(2048, n // 4)

        def gen_multi():
            wav, _ = wt.generate_fast(
                params, cfg, jax.random.PRNGKey(6), nS, primeS, temperature=1.0
            )
            np.asarray(wav)

        dt = timed(gen_multi, reps=2)
        agg = S * nS / dt
        print(f"gen XLA {S}-stream: {agg:,.0f} samples/s aggregate "
              f"({agg/16000:.1f}x realtime, {dt*1e6/(nS+cfg.receptive_field):.1f} us/step)")

    if on_tpu and cfg.kernel_size == 2:
        from pytorch_wavenet_tpu.ops.pallas.gen_kernel_hbm import (
            generate_fast_batched,
        )

        # (streams, ring_dtype, fuse_res, stage_layers, head_tiles, skip_slab)
        sweep = [
            (128, jnp.float32, False, None, None, False),
            (256, jnp.float32, False, None, None, False),
            (256, jnp.float32, True, None, None, False),
            (512, jnp.float32, False, 8, None, False),
            (512, jnp.float32, False, 8, None, True),
            (1024, jnp.float32, False, None, None, False),
        ]
        if cfg.skip_channels * cfg.end_channels >= 1 << 18:
            # wide-head configs: the head's (S/E/C, NS) intermediates are
            # what overflow VMEM at high stream counts — tile them, and
            # defer the skip projection into one deep slab matmul
            # (skip_slab: ~2x at every stream count, see PERF.md)
            sweep += [
                (1024, jnp.float32, False, 8, 2, True),
                (2048, jnp.float32, False, 8, 4, True),
            ]
        if cfg.residual_channels % 16 == 0:
            # bf16 rings halve DMA traffic and the VMEM staging that caps S;
            # a rotating stage window shrinks the staging further for the
            # stream counts the all-L slabs can't reach
            sweep += [
                (1024, jnp.bfloat16, False, None, None, False),
                (1024, jnp.bfloat16, False, 8, None, True),
                (2048, jnp.bfloat16, False, None, None, False),
                (2048, jnp.bfloat16, False, 8, None, False),
                (2048, jnp.bfloat16, False, 8, 2, True),
                (2048, jnp.bfloat16, False, 8, 4, True),
                (4096, jnp.bfloat16, False, 8, None, False),
                (4096, jnp.bfloat16, False, 8, 4, True),
                (8192, jnp.bfloat16, False, 8, 4, False),
                (8192, jnp.bfloat16, False, 8, 8, True),
                (16384, jnp.bfloat16, False, 8, 8, False),
            ]
        for S, rdt, fuse, stage, htile, slab in sweep:
            primeS = jnp.tile(prime, (S, 1))
            # compute-only mode runs the documented methodology exactly:
            # full --gen-samples clips, min-of-4 (docs/PERF.md compute-only
            # table); the with-download sweep keeps shorter clips — the
            # tunnel download dominates there anyway
            nS = n if args.hbm_kernel_only else max(2048, n // 4)
            hbm_reps = 4 if args.hbm_kernel_only else 2
            tag = "" if rdt == jnp.float32 else " bf16-ring"
            if fuse:
                tag += " fuse_res"
            if stage:
                tag += f" stage{stage}"
            if htile:
                tag += f" head/{htile}"
            if slab:
                tag += " slab"

            def gen_hbm():
                wav, cls = generate_fast_batched(
                    params, cfg, jax.random.PRNGKey(6), nS, primeS,
                    temperature=1.0, ring_dtype=rdt, fuse_res=fuse,
                    stage_layers=stage, head_tiles=htile, skip_slab=slab,
                )
                if args.hbm_kernel_only:
                    # 4-byte download that depends on the kernel output;
                    # a full-tensor int32 sum would overflow (classes sum
                    # to ~1.7e13 at 16384x16384) and read as garbage
                    np.asarray(jnp.max(cls[:, -1]))
                elif cfg.classes <= 256:
                    # uint8 class-id wire (the serving batcher's download
                    # path): same information as the waveform at 1/4 the
                    # bytes; the host dequantize is timed too (vectorized
                    # ops/mulaw — measured negligible vs the transfer)
                    from pytorch_wavenet_tpu.ops.mulaw import (
                        dequantize_to_f32,
                    )
                    dequantize_to_f32(
                        np.asarray(cls.astype(jnp.uint8, copy=False)),
                        cfg.classes,
                    )
                else:
                    np.asarray(wav)

            try:
                dt = timed(gen_hbm, reps=hbm_reps)
            except Exception as e:  # e.g. VMEM staging overflow at high S
                print(f"gen fused-HBM {S}-stream{tag}: skipped "
                      f"({type(e).__name__})")
                continue
            agg = S * nS / dt
            print(f"gen fused-HBM {S}-stream{tag}: {agg:,.0f} samples/s "
                  f"aggregate ({agg/16000:.0f}x realtime, "
                  f"{dt*1e6/(nS+cfg.receptive_field):.1f} us/step)")

    # ---------------- IAF student (parallel one-pass generation)
    from pytorch_wavenet_tpu.models.iaf import (
        IAFConfig,
        init_student,
        student_generate,
        student_parameter_count,
    )

    scfg = IAFConfig(flows=4, layers=10, blocks=1, residual_channels=64,
                     dilation_channels=64, skip_channels=64, end_channels=64)
    sparams = init_student(jax.random.PRNGKey(7), scfg)
    print(f"student: {scfg.flows} flows x {scfg.num_layers} layers, "
          f"{student_parameter_count(sparams):,} params")
    for S in (1, 16):
        def gen_student(S=S):
            wav = student_generate(sparams, scfg, jax.random.PRNGKey(8), n,
                                   num_streams=S)
            np.asarray(wav)

        dt = timed(gen_student, reps=3)
        agg = S * n / dt
        print(f"gen student {S}-stream: {agg:,.0f} samples/s aggregate "
              f"({agg/16000:.0f}x realtime, one parallel pass — "
              f"quality requires a distilled checkpoint)")

    # ---------------- host pipeline
    stream = np.random.default_rng(0).integers(0, 256, 10_000_000).astype(np.uint8)
    from pytorch_wavenet_tpu.data import native

    starts = np.random.default_rng(1).integers(
        0, len(stream) - cfg.item_length - 1, 512
    ).astype(np.int64)

    def gather():
        native.gather_windows(stream, starts, cfg.item_length, cfg.output_length)

    dt = timed(gather, reps=5)
    rate = 512 * cfg.item_length / dt / 1e6
    print(f"host window gather: {512/dt:,.0f} items/s ({rate:.0f} Msamples/s, "
          f"native={native.available()})")


if __name__ == "__main__":
    main()
