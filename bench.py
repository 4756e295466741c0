"""Headline benchmark: autoregressive generation throughput on one TPU chip.

Reference baseline (BASELINE.md): Fast-WaveNet generation on the 10x4 config
runs at ~81 samples/s (12.3 ms/step, profiling.ipynb cell 5; timing print at
reference wavenet_model.py:304-306). Same model config here, single stream,
steady-state samples/s on device via the fused Pallas kernel — target was
>10x the reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import os

if os.environ.get("WAVENET_TPU_FORCE_CPU"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import json
import sys
import time

import jax

BASELINE_SAMPLES_PER_SEC = 81.0  # reference CPU, profiling.ipynb cell 5


def main():
    from pytorch_wavenet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # restarts reload compiled programs from disk
    import pytorch_wavenet_tpu as wt
    from pytorch_wavenet_tpu.ops.pallas.gen_kernel import generate_fast_fused

    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except RuntimeError as e:  # device tunnel down: emit a metric anyway
        print(f"# TPU backend unavailable ({e}); falling back to CPU",
              file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        on_tpu = False
    if on_tpu and not os.environ.get("WAVENET_TPU_SKIP_EMISSION_CHECK"):
        # continuous guard for the TPU-only bf16 gated-unit emission path
        # (VERDICT r4 #5): every driver-captured bench run re-verifies the
        # bitwise contract the production training step rests on
        from pytorch_wavenet_tpu.utils.checks import (
            verify_bf16_emission,
            verify_embed_rows,
        )

        verify_bf16_emission()
        print("# bf16-emission bitwise check: OK", file=sys.stderr)
        verify_embed_rows()
        print("# embed one-hot-lowering bitwise check: OK", file=sys.stderr)
    if on_tpu:
        # fuse_res pre-multiplies each layer's residual 1x1 into the next
        # layer's gate weights so the serial chain is one dot per layer —
        # mathematically identical rollout, ~1.5x lower step latency
        # (docs/PERF.md "serial chain" notes).
        from functools import partial

        gen = partial(generate_fast_fused, fuse_res=True)
    else:
        gen = wt.generate_fast

    # reference: profiling.ipynb cell 1 — 10 layers x 4 blocks, 32ch, out 64
    cfg = wt.get_config("saber")
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    prime = jax.random.randint(
        jax.random.PRNGKey(2), (1, cfg.receptive_field), 0, cfg.classes
    )

    import numpy as np

    # long run: amortizes the receptive-field priming steps, which the
    # reference's step timer also excluded (it starts after priming,
    # wavenet_model.py:275)
    n = 65536 if on_tpu else 1024
    # compile; fall back to the pure-XLA path if the Pallas kernel cannot
    # compile on this runtime (the metric must always be emitted)
    try:
        wav, _ = gen(params, cfg, jax.random.PRNGKey(0), n, prime, temperature=1.0)
        np.asarray(wav)
    except Exception as e:  # pragma: no cover
        print(f"# fused kernel unavailable ({type(e).__name__}); XLA fallback",
              file=sys.stderr)
        gen = wt.generate_fast
        wav, _ = gen(params, cfg, jax.random.PRNGKey(0), n, prime, temperature=1.0)
        np.asarray(wav)

    best = float("inf")
    for rep in range(2):
        key = jax.random.PRNGKey(100 + rep)
        t0 = time.perf_counter()
        wav, _ = gen(params, cfg, key, n, prime, temperature=1.0)
        np.asarray(wav)  # full host transfer — block_until_ready alone has
        # been observed to return early through the axon tunnel
        best = min(best, time.perf_counter() - t0)

    samples_per_sec = n / best
    total_steps = cfg.receptive_field - 1 + n

    print(
        json.dumps(
            {
                "metric": "fast_generation_throughput_1stream_10x4",
                "value": round(samples_per_sec, 1),
                "unit": "samples/s",
                "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 2),
            }
        )
    )
    print(
        f"# {best*1e6/total_steps:.2f} us/step, {n} samples in {best:.2f}s, "
        f"kernel={'pallas-fused' if on_tpu else 'xla-scan'}, "
        f"platform={jax.devices()[0].platform}, "
        f"realtime_x16kHz={samples_per_sec/16000:.2f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
