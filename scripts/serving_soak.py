#!/usr/bin/env python
"""Serving endurance soak: randomized mixed load against one pool.

Where `serving_bench.py` measures steady-state capacity under uniform
load, this drives the batcher the way long-lived production traffic
does — mixed request lengths (including single-sample), mixed
temperatures, mid-flight cancellations, bursts and lulls — for
``--seconds``, then asserts the pool's lifecycle invariants:

* every submitted handle resolved (completed, cancelled, or failed —
  nothing hangs);
* counter coherence: ``admitted == completed + cancelled + failed`` and
  ``outstanding == 0`` after drain, every lane free;
* spot-checked exactness: a sample of greedy (temperature-0) requests
  must equal their solo rollouts bitwise (the reproducibility contract
  under arbitrary interleaving);
* host memory stays bounded (RSS growth over the soak is reported; a
  leaky pool shows up as monotonic growth per 1k requests).

CPU smoke (seconds-scale, interpret kernel):
  WAVENET_TPU_FORCE_CPU=1 python scripts/serving_soak.py --interpret \
      --config tiny --lanes 3 --chunk 32 --seconds 5 --max-samples 128
TPU soak:
  python scripts/serving_soak.py --config chaconne --lanes 256 \
      --skip-slab --seconds 300
"""

import os

if os.environ.get("WAVENET_TPU_FORCE_CPU"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import argparse
import json
import resource
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="chaconne")
    p.add_argument("--lanes", type=int, default=256)
    p.add_argument("--chunk", type=int, default=2048)
    p.add_argument("--seconds", type=float, default=300.0)
    p.add_argument("--workers", type=int, default=16)
    p.add_argument("--max-samples", type=int, default=16000)
    p.add_argument("--cancel-rate", type=float, default=0.1)
    p.add_argument("--reload-every", type=float, default=0.0,
                   help="seconds between live update_params swaps (0 = "
                        "off) — exercises rolling weight updates under "
                        "load. Spot checks are skipped while reloads are "
                        "on (a mid-request swap legitimately changes the "
                        "rollout)")
    p.add_argument("--check-rate", type=float, default=0.05,
                   help="fraction of greedy requests verified against a "
                        "solo rollout (bitwise)")
    p.add_argument("--ring-dtype", choices=("f32", "bf16"), default="bf16")
    p.add_argument("--skip-slab", action="store_true")
    p.add_argument("--interpret", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json", action="store_true")
    return p.parse_args()


def main():
    from pytorch_wavenet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    args = parse_args()

    import pytorch_wavenet_tpu as wt
    from pytorch_wavenet_tpu.serving import ContinuousBatcher
    from pytorch_wavenet_tpu.serving.batcher import RequestCancelled

    cfg = wt.get_config(args.config)
    params = wt.init_wavenet(jax.random.PRNGKey(args.seed), cfg)
    b = ContinuousBatcher(
        params, cfg, lanes=args.lanes, chunk=args.chunk, seed=args.seed,
        interpret=args.interpret,
        ring_dtype=jnp.bfloat16 if args.ring_dtype == "bf16"
        else jnp.float32,
        skip_slab=args.skip_slab,
    )
    b.prewarm()

    # solo oracle for the greedy spot checks (same kernel settings as the
    # pool, one stream, the request's own seed)
    def solo(prime, n, seed):
        from pytorch_wavenet_tpu.ops.pallas.gen_kernel_hbm import (
            generate_fast_batched,
        )

        _, cls = generate_fast_batched(
            params, cfg, jax.random.PRNGKey(0), n, prime[None],
            temperature=jnp.zeros((1,)),
            lane_seed=jnp.asarray([seed], jnp.int32),
            **b._kw,  # carries interpret + the pool's kernel settings
        )
        return np.asarray(cls[0])

    lock = threading.Lock()
    counts = dict(submitted=0, completed=0, cancelled=0, failed=0,
                  checked=0, mismatched=0, hung=0, worker_errors=0)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    # fixed size palette: request sizes don't change pool programs (splice
    # and download widths bucket to powers of two), but each distinct size
    # compiles a fresh SOLO oracle — unbounded sizes once turned the spot
    # checker into a compile storm that crashed the device worker
    sizes = sorted({1, 7, 64, 501, 1024, min(2048, args.max_samples),
                    min(5000, args.max_samples), args.max_samples})
    if args.check_rate > 0:
        # compile the solo oracles for every checkable size BEFORE the
        # clock starts (each distinct length is a fresh program)
        for n in sizes:
            if n <= 4 * args.chunk:
                solo(jnp.asarray([cfg.classes // 2], jnp.int32), n, 0)
    stop = time.monotonic() + args.seconds

    def worker(wid):
        try:
            _worker(wid)
        except BaseException as e:
            print(f"worker {wid} died: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            with lock:
                counts["worker_errors"] += 1

    def _worker(wid):
        rng = np.random.default_rng((args.seed, wid))
        while time.monotonic() < stop:
            n = int(rng.choice(sizes))
            temp = float(rng.choice([0.0, 1.0]))
            seed = int(rng.integers(0, 1 << 30))
            prime = np.asarray([cfg.classes // 2], np.int32)
            with lock:
                counts["submitted"] += 1
            try:
                h = b.submit(prime, n, temperature=temp, seed=seed)
            except RuntimeError:  # pool closing at soak end
                with lock:
                    counts["submitted"] -= 1
                return
            if rng.random() < args.cancel_rate:
                time.sleep(float(rng.random() * 0.05))
                h.cancel()
            try:
                _, cls = h.result(timeout=600)
            except RequestCancelled:
                with lock:
                    counts["cancelled"] += 1
                continue
            except TimeoutError:
                with lock:
                    counts["hung"] += 1
                continue
            except BaseException:
                with lock:
                    counts["failed"] += 1
                continue
            with lock:
                counts["completed"] += 1
            if temp == 0.0 and n <= 4 * args.chunk \
                    and args.reload_every == 0 \
                    and rng.random() < args.check_rate:
                try:
                    ok = np.array_equal(cls,
                                        solo(jnp.asarray(prime), n, seed))
                except BaseException as e:
                    print(f"solo check error: {type(e).__name__}: {e}",
                          file=sys.stderr, flush=True)
                    with lock:
                        counts["worker_errors"] += 1
                    continue
                with lock:
                    counts["checked"] += 1
                    counts["mismatched"] += 0 if ok else 1

    threads = [threading.Thread(target=worker, args=(w,))
               for w in range(args.workers)]
    if args.reload_every > 0:
        def reloader():
            k = 0
            while time.monotonic() < stop:
                time.sleep(args.reload_every)
                k += 1
                # same tree/shapes, different values — a real trainer swap
                b.update_params(jax.tree_util.tree_map(
                    lambda a: a * (1.0 + 1e-4 * (k % 3)), params))
        threads.append(threading.Thread(target=reloader))
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    b.close(drain=True, timeout=600)
    stats = b.stats()
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    report = {
        **counts,
        "wall_s": round(wall, 1),
        "pool_admitted": stats["admitted"],
        "pool_completed": stats["completed"],
        "pool_cancelled": stats["cancelled"],
        "pool_failed": stats["failed"],
        "pool_outstanding": stats["outstanding"],
        "pool_free": stats["free"],
        "pool_steps": stats["pool_steps"],
        "rss_growth_mb": round((rss1 - rss0) / 1024, 1),
    }
    print(json.dumps(report) if args.json else report)

    problems = []
    if counts["hung"]:
        problems.append(f"{counts['hung']} requests hung")
    if counts["mismatched"]:
        problems.append(f"{counts['mismatched']} greedy mismatches")
    if stats["outstanding"] != 0:
        problems.append(f"outstanding={stats['outstanding']} after drain")
    if stats["free"] != args.lanes:
        problems.append(f"leaked lanes: free={stats['free']}")
    # cancels can land BEFORE admission (still counted `cancelled`), so
    # the coherent invariant is: lane-admitted work resolves as completed,
    # failed, or a post-admission cancel
    gap = stats["admitted"] - stats["completed"] - stats["failed"]
    if not (0 <= gap <= stats["cancelled"]):
        problems.append(
            f"counter incoherence: admitted - completed - failed = {gap} "
            f"not within [0, cancelled={stats['cancelled']}]")
    if counts["worker_errors"]:
        problems.append(f"{counts['worker_errors']} worker errors")
    if problems:
        raise SystemExit("SOAK FAILED: " + "; ".join(problems))
    print(f"soak OK: {counts['completed']} completed / "
          f"{counts['cancelled']} cancelled / {counts['checked']} spot-"
          f"checked bitwise over {wall:.0f} s", file=sys.stderr)


if __name__ == "__main__":
    main()
