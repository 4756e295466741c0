#!/usr/bin/env python
"""Training-scaling measurement (BASELINE.md: audio-seconds/s at 1 chip /
1 host / N hosts, target >=85% linear to 2 hosts).

Runs the identical sharded train step over increasing mesh sizes with the
global batch scaled proportionally, and reports audio-seconds/s and scaling
efficiency vs the single-device run. On a multi-chip slice this measures
real ICI scaling; on one chip (or CPU with
--xla_force_host_platform_device_count=N) it validates the measurement path
itself end to end.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("WAVENET_TPU_FORCE_CPU"):
    # must precede backend init; JAX_PLATFORMS alone is ignored by the
    # axon plugin (CLAUDE.md) — same handling as the other CLIs
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np


def measure(cfg, tx, mesh, global_batch, steps=20):
    import pytorch_wavenet_tpu as wt
    from pytorch_wavenet_tpu.parallel.training import (
        make_sharded_train_state,
        parallel_train_step,
        put_batch,
    )

    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    p, o = make_sharded_train_state(cfg, params, tx, mesh)
    x = jax.random.randint(
        jax.random.PRNGKey(1), (global_batch, cfg.item_length), 0, cfg.classes
    )
    y = jax.random.randint(
        jax.random.PRNGKey(2), (global_batch, cfg.output_length), 0, cfg.classes
    )
    x, y = put_batch(mesh, x, y)
    p, o, loss = parallel_train_step(p, o, cfg, tx, x, y)  # compile
    np.asarray(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        p, o, loss = parallel_train_step(p, o, cfg, tx, x, y)
    np.asarray(loss)
    dt = (time.perf_counter() - t0) / steps
    audio_s = global_batch * cfg.output_length / 16000.0 / dt
    return dt, audio_s


def main():
    from pytorch_wavenet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # restarts reload compiled programs from disk
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="chaconne")
    ap.add_argument("--per-device-batch", type=int, default=16)
    ap.add_argument("--model-axis", type=int, default=1)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import pytorch_wavenet_tpu as wt
    from pytorch_wavenet_tpu.parallel.mesh import make_mesh

    cfg = wt.get_config(args.config)
    tx = wt.reference_adam(1e-4)
    n = jax.device_count()
    print(f"devices={n} platform={jax.devices()[0].platform} config={args.config}")

    sizes = sorted({1, 2, 4, n // args.model_axis}) if n > 1 else [1]
    base = None
    for data in sizes:
        if data < 1 or data * args.model_axis > n:
            continue
        mesh = make_mesh(
            data=data, model=args.model_axis,
            devices=jax.devices()[: data * args.model_axis],
        )
        gb = args.per_device_batch * data
        dt, audio_s = measure(cfg, tx, mesh, gb, args.steps)
        if base is None:
            base = audio_s
        eff = audio_s / (base * data) * 100.0
        print(
            f"mesh data={data} model={args.model_axis} batch={gb}: "
            f"{dt*1e3:.2f} ms/step, {audio_s:.2f} audio-s/s, "
            f"scaling {eff:.0f}% of linear"
        )


if __name__ == "__main__":
    main()
