#!/usr/bin/env python
"""Serving load benchmark: the continuous batcher under concurrent traffic.

Drives :class:`pytorch_wavenet_tpu.serving.ContinuousBatcher` (the engine
behind ``scripts/serve.py --batcher``) with a closed-loop load generator —
``--concurrency`` in-flight requests are kept outstanding until
``--requests`` complete — and reports the serving numbers that matter:

* aggregate throughput (samples/s across all completed requests) and the
  per-stream realtime factor at that load;
* time-to-first-audio (submit -> first delivered chunk, which includes
  lane-admission wait under saturation) p50/p95;
* request completion latency p50/p95.

The reference has no serving story at all (generation is a blocking
batch-1 script, wavenet_model.py:237), so there is no baseline column —
these numbers stand on their own in docs/PERF.md.

Examples:
  # capacity: saturate a 256-lane pool with 4s clips
  python scripts/serving_bench.py --config saber --lanes 256 \
      --concurrency 512 --requests 1024 --num-samples 64000
  # latency: a lightly loaded pool
  python scripts/serving_bench.py --lanes 256 --concurrency 8 --requests 64
  # CPU smoke (tiny everything, interpret-mode kernel)
  python scripts/serving_bench.py --interpret --config tiny --lanes 3 \
      --chunk 32 --concurrency 2 --requests 4 --num-samples 64
"""

import os

if os.environ.get("WAVENET_TPU_FORCE_CPU"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import argparse
import json
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="saber")
    p.add_argument("--snapshot", default=None,
                   help="checkpoint file (default: random init — serving "
                        "perf does not depend on the weights' values)")
    p.add_argument("--lanes", type=int, default=256)
    p.add_argument("--chunk", type=int, default=2048,
                   help="splice granularity in samples (= streaming "
                        "time-to-first-audio floor)")
    p.add_argument("--light-chunk", type=int, default=None,
                   help="adaptive chunking: dispatch this many steps per "
                        "chunk while the pool is lightly loaded (cuts the "
                        "TTFA chunk-wall floor; outputs are bitwise "
                        "chunk-invariant)")
    p.add_argument("--concurrency", type=int, default=512,
                   help="closed-loop in-flight requests (> lanes "
                        "saturates the pool and measures capacity)")
    p.add_argument("--requests", type=int, default=1024)
    p.add_argument("--num-samples", type=int, default=16000)
    p.add_argument("--prime-len", type=int, default=1,
                   help="request prime length (1 = unprimed; the "
                        "receptive field exercises solo-prime admission)")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--cond", action="store_true",
                   help="mel-conditioned load: every request carries its "
                        "own random conditioning timeline (requires a "
                        "config with cond_channels, e.g. --config vocoder)")
    p.add_argument("--cond-hop", type=int, default=256,
                   help="conditioned load ships mel FRAMES at this hop "
                        "and the pool expands on device (the production "
                        "frames-on-the-wire path); 0 = legacy per-sample "
                        "rows")
    p.add_argument("--ring-dtype", choices=("f32", "bf16"), default="bf16")
    p.add_argument("--cond-wire", choices=("f32", "bf16"), default="f32",
                   help="frames-mode mel upload dtype: bf16 halves the "
                        "per-chunk cond upload (responses equal the solo "
                        "rollout of bf16-rounded frames)")
    p.add_argument("--exact-chain", action="store_true",
                   help="disable fuse_res (the reassociated serial chain)")
    p.add_argument("--stage-layers", type=int, default=8)
    p.add_argument("--head-tiles", type=int, default=None)
    p.add_argument("--skip-slab", action="store_true",
                   help="deferred one-dot skip projection (1.6-1.9x on "
                        "wide-skip configs, see PERF.md)")
    p.add_argument("--mesh-data", type=int, default=0,
                   help="shard the lane pool over this many chips "
                        "(--lanes is the pool total)")
    p.add_argument("--interpret", action="store_true",
                   help="interpret-mode kernel on CPU (smoke test only)")
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json", action="store_true",
                   help="emit one machine-readable JSON line at the end")
    p.add_argument("--device-profile", action="store_true",
                   help="trace the measured window with jax.profiler and "
                        "report the transport-NORMALIZED capacity: device-"
                        "time-bound aggregate + wire bytes/sample — stable "
                        "across tunnel congestion, predicts attached-host "
                        "capacity (VERDICT r4 #4)")
    return p.parse_args()


def main():
    from pytorch_wavenet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # restarts reload compiled programs from disk
    args = parse_args()

    import pytorch_wavenet_tpu as wt
    from pytorch_wavenet_tpu.serving import ContinuousBatcher

    if args.snapshot:
        from pytorch_wavenet_tpu.utils.checkpoints import load_checkpoint

        ck = load_checkpoint(args.snapshot)
        params, cfg = ck["params"], ck["config"]
    else:
        cfg = wt.get_config(args.config)
        params = wt.init_wavenet(jax.random.PRNGKey(args.seed), cfg)

    mesh = None
    if args.mesh_data:
        from pytorch_wavenet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh_data, 1,
                         devices=jax.devices()[: args.mesh_data])
    batcher = ContinuousBatcher(
        params, cfg, lanes=args.lanes, chunk=args.chunk, seed=args.seed,
        interpret=args.interpret,
        ring_dtype=jnp.bfloat16 if args.ring_dtype == "bf16"
        else jnp.float32,
        fuse_res=not args.exact_chain,
        stage_layers=args.stage_layers, head_tiles=args.head_tiles,
        skip_slab=args.skip_slab,
        cond_hop=args.cond_hop if (args.cond and args.cond_hop) else None,
        light_chunk=args.light_chunk,
        cond_wire_dtype=jnp.bfloat16 if args.cond_wire == "bf16"
        else jnp.float32,
        mesh=mesh,
    )

    rng = np.random.default_rng(args.seed)
    if args.cond and cfg.cond_channels == 0:
        raise SystemExit("--cond needs a conditioned config "
                         "(cfg.cond_channels > 0), e.g. --config vocoder")

    def make_cond(n=None, rng=rng):
        # worker threads pass their own rng — numpy Generators are not
        # thread-safe, and concurrent draws on a shared one can corrupt
        # its state
        if not args.cond:
            return None
        rows = args.prime_len - 1 + (n or args.num_samples)
        if args.cond_hop:  # frames on the wire (hop x less upload)
            rows = -(-rows // args.cond_hop)
        return rng.normal(
            0.0, 0.3, (rows, cfg.cond_channels)).astype(np.float32)

    cond_kw = "cond_frames" if (args.cond and args.cond_hop) else "cond"

    if args.prime_len == 1:
        primes = [np.asarray([cfg.classes // 2], np.int32)] * args.requests
    else:
        primes = [rng.integers(0, cfg.classes, args.prime_len,
                               dtype=np.int32) for _ in range(args.requests)]

    # compile warm-up so the measured window is steady-state serving, not
    # XLA compilation: prewarm() builds the admission programs for EVERY
    # burst-width bucket (a production server does the same at boot); the
    # throwaway request compiles the pool-step program
    t0 = time.perf_counter()
    batcher.prewarm(prime_lengths=(args.prime_len,))
    if args.cond:
        warm_n = min(args.num_samples, 2 * args.chunk)
        batcher.submit(primes[0], warm_n, temperature=args.temperature,
                       **{cond_kw: make_cond(warm_n)}).result(timeout=3600)
    else:
        batcher.submit(primes[0], min(args.num_samples, 2 * args.chunk),
                       temperature=args.temperature).result(timeout=3600)
    print(f"warm-up (compile): {time.perf_counter() - t0:.1f} s",
          flush=True)

    lock = threading.Lock()
    issued = 0
    failures = 0
    ttfa: list[float] = []
    latency: list[float] = []
    timings: list[dict] = []  # per-request batcher lifecycle marks

    def worker(wid=0):
        nonlocal issued, failures
        wrng = np.random.default_rng((args.seed, wid))
        while True:
            with lock:
                if issued >= args.requests:
                    return
                i = issued
                issued += 1
            first = []
            t_sub = time.perf_counter()
            try:
                h = batcher.submit(
                    primes[i], args.num_samples,
                    temperature=args.temperature, seed=i,
                    on_chunk=lambda c, f=first, t=t_sub: f.append(
                        time.perf_counter() - t) if not f else None,
                    **{cond_kw: make_cond(rng=wrng)},
                )
                _, cls = h.result(timeout=3600)
                t_done = time.perf_counter() - t_sub
                assert cls.shape == (args.num_samples,), cls.shape
            except BaseException as e:  # count it, keep loading the pool
                with lock:
                    failures += 1
                print(f"request {i} failed: {type(e).__name__}: {e}",
                      file=sys.stderr, flush=True)
                continue
            with lock:
                ttfa.append(first[0])
                latency.append(t_done)
                timings.append(dict(h.timing))

    threads = [threading.Thread(target=worker, args=(w,))
               for w in range(args.concurrency)]
    stats0 = batcher.stats()  # subtract warm-up traffic from the window
    prof_dir = None
    if args.device_profile:
        import tempfile

        prof_dir = tempfile.mkdtemp(prefix="serving_prof_")
        jax.profiler.start_trace(prof_dir)
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    if prof_dir:
        jax.profiler.stop_trace()
    stats = batcher.stats()
    batcher.close()

    if not latency:
        print(f"all {args.requests} requests failed", file=sys.stderr)
        sys.exit(1)
    total = len(latency) * args.num_samples  # completed requests only
    agg = total / wall
    q = lambda xs, p: float(np.percentile(np.asarray(xs), p))  # noqa: E731
    summary = {
        "config": args.config, "cond": bool(args.cond),
        "lanes": args.lanes, "chunk": args.chunk,
        "concurrency": args.concurrency, "requests": args.requests,
        "completed": len(latency), "failed": failures,
        "num_samples": args.num_samples, "wall_s": round(wall, 3),
        "agg_samples_per_s": round(agg),
        "realtime_x": round(agg / args.sr, 1),
        "ttfa_p50_ms": round(q(ttfa, 50) * 1e3, 1),
        "ttfa_p95_ms": round(q(ttfa, 95) * 1e3, 1),
        "latency_p50_s": round(q(latency, 50), 3),
        "latency_p95_s": round(q(latency, 95), 3),
        # worker-loop phase breakdown (where the pool's wall time went)
        **{k: v for k, v in stats.items()
           if k in ("pool_steps", "prime_calls") or k.startswith("t_")},
    }
    print(
        f"{len(latency)}/{args.requests} x {args.num_samples} samples, "
        f"{args.concurrency} in flight over {args.lanes} lanes "
        f"(chunk {args.chunk}): {agg:,.0f} samples/s aggregate "
        f"({agg / args.sr:,.1f}x realtime)\n"
        f"TTFA p50/p95: {summary['ttfa_p50_ms']:.0f}/"
        f"{summary['ttfa_p95_ms']:.0f} ms | completion p50/p95: "
        f"{summary['latency_p50_s']:.2f}/{summary['latency_p95_s']:.2f} s"
    )

    # ---- TTFA decomposition from the batcher's per-request marks
    # (VERDICT r3 #4: name the tail's cause, don't just report percentiles)
    full = [t for t in timings
            if all(k in t for k in ("t_submit", "t_admitted", "t_first"))]
    if full:
        phases = {
            "wait (submit->admitted)":
                [t["t_admitted"] - t["t_submit"] for t in full],
            "prime dispatch": [t["prime_s"] for t in full],
            "splice dispatch": [t["splice_s"] for t in full],
            "first-sample sync (admitted->first)":
                [t["t_first"] - t["t_admitted"] for t in full],
        }
        print(f"\nTTFA decomposition ({len(full)} requests with marks):")
        print(f"  {'phase':<38}{'p50 ms':>9}{'p95 ms':>9}{'max ms':>9}")
        for name, xs in phases.items():
            print(f"  {name:<38}{q(xs, 50)*1e3:>9.1f}{q(xs, 95)*1e3:>9.1f}"
                  f"{max(xs)*1e3:>9.1f}")
        # the tail, attributed: among the slowest-TTFA 5%, which phase
        # dominates each request?
        tt = [t["t_first"] - t["t_submit"] for t in full]
        cut = q(tt, 95)
        tail = [t for t, v in zip(full, tt) if v >= cut]
        if tail:
            dom: dict[str, int] = {}
            for t in tail:
                parts = {
                    "wait": t["t_admitted"] - t["t_submit"]
                    - t["prime_s"] - t["splice_s"],
                    "prime": t["prime_s"],
                    "splice": t["splice_s"],
                    "first_sync": t["t_first"] - t["t_admitted"],
                }
                k = max(parts, key=parts.get)
                dom[k] = dom.get(k, 0) + 1
            parts = ", ".join(f"{k}: {v}" for k, v in
                              sorted(dom.items(), key=lambda kv: -kv[1]))
            print(f"  p95-tail ({len(tail)} reqs >= {cut*1e3:.0f} ms) "
                  f"dominated by: {parts}")
        summary["ttfa_wait_p95_ms"] = round(
            q(phases["wait (submit->admitted)"], 95) * 1e3, 1)
        summary["ttfa_first_sync_p95_ms"] = round(
            q(phases["first-sample sync (admitted->first)"], 95) * 1e3, 1)
    # ---- transport-normalized capacity (VERDICT r4 #4): the wall
    # aggregate above rides the host link's congestion weather; the
    # device-time-bound aggregate and wire bytes/sample are properties of
    # the ENGINE, stable across sessions, and predict capacity on any
    # attached host as 1 / (device_s_per_sample + bytes_per_sample / BW).
    bytes_down = stats["bytes_down"] - stats0["bytes_down"]
    bytes_up = stats["bytes_up"] - stats0["bytes_up"]
    summary["bytes_down"] = bytes_down
    summary["bytes_up"] = bytes_up
    summary["wire_bytes_per_sample"] = round(
        (bytes_down + bytes_up) / max(total, 1), 3)
    if prof_dir:
        import collections
        import glob
        import gzip

        traces = glob.glob(os.path.join(prof_dir, "**", "*.trace.json.gz"),
                           recursive=True)
        busy_us = 0.0
        if traces:
            with gzip.open(traces[0]) as f:
                data = json.load(f)
            ev = data["traceEvents"]
            pids = {e["pid"]: e["args"]["name"] for e in ev
                    if e.get("ph") == "M" and e.get("name") == "process_name"}
            # leaf device ops only (args carry source/tf_op): module-level
            # "jit_*" spans include input-transfer stalls, which puts the
            # tunnel weather right back into the metric (measured 2x run-
            # to-run swing); leaf op durations are actual execution
            busy_us = sum(
                e["dur"] for e in ev
                if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], "")
                and not e["name"].startswith("jit")
                and ((e.get("args") or {}).get("source")
                     or (e.get("args") or {}).get("tf_op"))
            )
        if busy_us:
            device_busy_s = busy_us / 1e6
            engine = total / device_busy_s
            bps = (bytes_down + bytes_up) / max(total, 1)
            summary["device_busy_s"] = round(device_busy_s, 3)
            summary["device_bound_samples_per_s"] = round(engine)
            print(
                f"\ntransport-normalized capacity:\n"
                f"  device busy {device_busy_s:.2f} s of {wall:.2f} s wall "
                f"({device_busy_s/wall:.0%} duty)\n"
                f"  device-time-bound aggregate: {engine:,.0f} samples/s "
                f"({engine/args.sr:,.0f}x realtime)\n"
                f"  wire: {bps:.2f} B/sample "
                f"({bytes_down/1e6:.1f} MB down + {bytes_up/1e6:.1f} MB up "
                f"over {total:,} samples)\n"
                f"  predicted capacity = 1/(1/{engine:,.0f} + B_per_sample/"
                f"link_BW): "
                + ", ".join(
                    f"{bw_name} {1.0/(1.0/engine + bps/bw):,.0f}/s"
                    for bw_name, bw in (("50MB/s tunnel", 50e6),
                                        ("1GB/s host", 1e9),
                                        ("8GB/s host", 8e9))
                )
            )
        else:
            print("\n(device profile produced no TPU trace - normalized "
                  "capacity unavailable on this backend)")
    if args.json:
        print(json.dumps(summary))


if __name__ == "__main__":
    main()
