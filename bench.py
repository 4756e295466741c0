"""Headline benchmark: autoregressive generation throughput on one TPU chip.

Reference baseline (BASELINE.md): Fast-WaveNet generation on the 10x4 config
runs at ~81 samples/s (12.3 ms/step, profiling.ipynb cell 5; timing print at
reference wavenet_model.py:304-306). Same model config here, single stream,
steady-state samples/s on device — target is >10x the reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_SAMPLES_PER_SEC = 81.0  # reference CPU, profiling.ipynb cell 5


def main():
    import pytorch_wavenet_tpu as wt

    # reference: profiling.ipynb cell 1 — 10 layers x 4 blocks, 32ch, out 64
    cfg = wt.get_config("saber")
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)

    key = jax.random.PRNGKey(1)
    prime = jax.random.randint(
        jax.random.PRNGKey(2), (1, cfg.receptive_field), 0, cfg.classes
    )

    # compile
    n_warm = 256
    wav, _ = wt.generate_fast(params, cfg, key, n_warm, prime, temperature=1.0)
    wav.block_until_ready()

    # steady state: time a long generation, subtract nothing (prime cost is
    # amortized into the run like the reference's step-100 timing)
    n = 8192
    t0 = time.perf_counter()
    wav, cls = wt.generate_fast(params, cfg, key, n, prime, temperature=1.0)
    wav.block_until_ready()
    dt = time.perf_counter() - t0

    total_steps = cfg.receptive_field - 1 + n  # prime steps + sample steps
    samples_per_sec = n / dt

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
        f"# {dt*1e3/total_steps:.3f} ms/step incl prime, {n} samples in {dt:.2f}s, "
        f"platform={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
