#!/usr/bin/env python
"""Training-step phase attribution (VERDICT r3 #2).

Where does the trunk-kernel training step's time go? This traces the
production ``train_step`` with ``jax.profiler`` (one program — no extra
compiles, no dispatch-latency distortion) and aggregates device-op
durations by SOURCE LINE, so every fusion is attributed to the code that
emitted it (kernel fwd/bwd, skip contraction, head, loss, embed, adam).

Why not component timings? Two measured environment facts make them
useless here (see docs/PERF.md round-4 notes): a single dispatch through
the device tunnel pays ~26 ms RTT (swamping any sub-ms phase), chained
dispatches pay a congestion-dependent ~1-1.5 ms enqueue floor each, and
Mosaic kernels cannot be amortized inside one dispatch — pallas calls in
a ``lax.scan`` body did not finish compiling within 20 minutes even at
the tiny config, and unrolled copies compile at ~108 s per instance.
The profiler sidesteps all of it: wall-accurate device timelines for the
exact production program.

Usage:  python scripts/train_phase_bench.py --config chaconne_wide
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def classify(source: str, tf_op: str, name: str) -> str:
    """Map a device op to a phase by its emitting source line."""
    bwd = "transpose(" in tf_op
    if "trunk_kernel.py" in source or "pallas_call" in tf_op:
        if "pallas_call" in tf_op or name.startswith(("jvp", "transpose")):
            return "kernel bwd" if bwd else "kernel fwd"
        return "kernel glue (pad/reshape)"
    if "optax" in source or "_classification" in source:
        return "loss"
    try:
        path, line = source.rsplit(":", 1)
        with open(path) as f:
            text = f.readlines()[int(line) - 1]
    except Exception:
        text = ""
    if "end1" in text or "end2" in text or "relu" in text \
            or "jnp.matmul" in text:
        # head 1x1s (and their grads, adam-fused) route through _mm
        return "head bwd" if bwd else "head fwd"
    if "skip" in text or "u5" in text:
        return "skip dot bwd" if bwd else "skip dot fwd"
    if "logsumexp" in text or "one_hot" in text or "losses" in text \
            or "jnp.mean" in text:
        return "loss"
    if "take" in text or "embed" in text or "_embed" in source:
        return "embed"
    if "apply_updates" in source or "update" in text or "adam" in text:
        return "adam"
    return "other"


def main():
    from pytorch_wavenet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="chaconne_wide")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--xla-trunk", action="store_true")
    p.add_argument("--bf16-stream", action="store_true",
                   help="cfg.stream_dtype=bfloat16 (halves the kernel's "
                        "VMEM stream/tap traffic)")
    p.add_argument("--top", type=int, default=14,
                   help="rows of the per-op table")
    args = p.parse_args()

    import pytorch_wavenet_tpu as wt
    from pytorch_wavenet_tpu.training.trainer import train_step
    from pytorch_wavenet_tpu.utils.profiling import trunk_flops

    overrides = {"trunk_kernel": not args.xla_trunk}
    if args.bf16_stream:
        overrides["stream_dtype"] = jnp.bfloat16
    cfg = wt.get_config(args.config, **overrides)
    B = args.batch_size
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    tx = wt.reference_adam(1e-4)
    p_ = jax.tree_util.tree_map(jnp.array, params)
    o_ = tx.init(params)
    x = jax.random.randint(
        jax.random.PRNGKey(1), (B, cfg.item_length), 0, cfg.classes
    )
    y = jax.random.randint(
        jax.random.PRNGKey(2), (B, cfg.output_length), 0, cfg.classes
    )
    cond = None
    if cfg.cond_channels:  # conditioned configs train the vocoder path
        cond = 0.3 * jax.random.normal(
            jax.random.PRNGKey(3),
            (B, cfg.item_length, cfg.cond_channels))
    print(f"platform={jax.devices()[0].platform} config={args.config} "
          f"B={B} out={cfg.output_length} trunk_kernel={cfg.trunk_kernel} "
          f"cond={cfg.cond_channels}", flush=True)

    p_, o_, loss, _ = train_step(p_, o_, cfg, tx, x, y, cond)  # warm
    np.asarray(loss)

    tdir = tempfile.mkdtemp(prefix="wavenet_phase_")
    with jax.profiler.trace(tdir):
        for _ in range(args.steps):
            p_, o_, loss, _ = train_step(p_, o_, cfg, tx, x, y, cond)
        np.asarray(loss)

    traces = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                       recursive=True)
    if not traces:
        raise SystemExit(f"no trace produced under {tdir} — profiler "
                         "unsupported on this backend?")
    with gzip.open(traces[0]) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}

    phase_dur = collections.Counter()
    op_dur = collections.Counter()
    op_meta = {}
    step_total = 0.0
    for e in ev:
        if e.get("ph") != "X" or "TPU" not in pids.get(e["pid"], ""):
            continue
        a = e.get("args") or {}
        if e["name"].startswith("jit_train_step"):
            step_total += e["dur"] / args.steps / 1e3
            continue
        if not a.get("source") and not a.get("tf_op"):
            continue  # module/step summary rows
        ph = classify(a.get("source", ""), a.get("tf_op", ""), e["name"])
        phase_dur[ph] += e["dur"]
        op_dur[e["name"]] += e["dur"]
        op_meta[e["name"]] = (ph, a.get("source", ""))

    total_ops = sum(phase_dur.values())
    print(f"\nper-phase device time (over {args.steps} steps):")
    print(f"  {'phase':<26}{'ms/step':>9}{'% of step':>11}")
    for ph, d in phase_dur.most_common():
        ms = d / args.steps / 1e3
        print(f"  {ph:<26}{ms:>9.3f}{100*d/total_ops:>10.1f}%")
    print(f"  {'-- sum of ops --':<26}{total_ops/args.steps/1e3:>9.3f}")
    if step_total:
        flops = 3 * trunk_flops(cfg, B)
        print(f"\nfull step (device): {step_total:.3f} ms   "
              f"{flops/(step_total/1e3)/1e12:.1f} TFLOP/s effective "
              f"({flops/1e9:.1f} GFLOP fwd+2bwd)")

    print(f"\ntop {args.top} device ops:")
    for name, d in op_dur.most_common(args.top):
        ph, src = op_meta[name]
        src = src.split("/pytorch_wavenet_tpu/")[-1].split(
            "/site-packages/")[-1]
        print(f"  {d/args.steps/1e3:8.3f} ms  [{ph}] {name[:36]:<38} {src}")


if __name__ == "__main__":
    main()
