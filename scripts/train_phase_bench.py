#!/usr/bin/env python
"""Training-step phase attribution (VERDICT r3 #2).

Times each component of the trunk-kernel training step in isolation —
embed, kernel forward, kernel forward+backward, the skip/head/loss tail,
and the optimizer — so the step's cost is attributed, not guessed.

Methodology (CLAUDE.md environment rules): each phase is ``--iters``
chained async dispatches of one jitted program, synced once at the end
(`np.asarray` of a scalar slice), min over ``--reps`` chains. This is the
same harness the production step timings in docs/PERF.md use, so the
"full step" row here is directly comparable — and the component programs
are the production ones, so the persistent compile cache makes reruns
cheap. (A scanned single-dispatch variant was tried first and abandoned:
the fused-kernel train step inside a 20-iteration scan did not finish
compiling within 20 minutes through the device tunnel.)

Usage:  python scripts/train_phase_bench.py --config chaconne_wide
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def chain_timed(dispatch, sync, iters, reps):
    """dispatch() enqueues one async device step (carrying state in
    closures if needed); sync() materializes a scalar off the last
    result. Returns best per-iteration seconds over ``reps`` chains."""
    dispatch()
    sync()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            dispatch()
        sync()
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    from pytorch_wavenet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="chaconne_wide")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--xla-trunk", action="store_true",
                   help="attribute the XLA-trunk step instead")
    args = p.parse_args()

    import optax

    import pytorch_wavenet_tpu as wt
    from pytorch_wavenet_tpu.models.wavenet import embed_inputs
    from pytorch_wavenet_tpu.ops.pallas.trunk_kernel import fused_trunk
    from pytorch_wavenet_tpu.training.trainer import (
        cross_entropy_loss,
        train_step,
    )
    from pytorch_wavenet_tpu.utils.profiling import trunk_flops

    cfg = wt.get_config(args.config, trunk_kernel=not args.xla_trunk)
    B = args.batch_size
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    tx = wt.reference_adam(1e-4)
    x = jax.random.randint(
        jax.random.PRNGKey(1), (B, cfg.item_length), 0, cfg.classes
    )
    y = jax.random.randint(
        jax.random.PRNGKey(2), (B, cfg.output_length), 0, cfg.classes
    )
    out_len = cfg.output_length
    print(f"platform={jax.devices()[0].platform} config={args.config} "
          f"B={B} out={out_len} trunk_kernel={cfg.trunk_kernel} "
          f"iters={args.iters} reps={args.reps}", flush=True)

    results = {}

    def run_phase(name, dispatch, sync):
        results[name] = chain_timed(dispatch, sync, args.iters, args.reps)
        print(f"  {name}: {results[name]*1e3:.3f} ms", flush=True)

    # ---- full step (the production donated train_step)
    st = {"p": jax.tree_util.tree_map(jnp.array, params), "o": tx.init(params),
          "loss": None}

    def full_dispatch():
        st["p"], st["o"], st["loss"], _ = train_step(
            st["p"], st["o"], cfg, tx, x, y
        )

    run_phase("full step", full_dispatch, lambda: np.asarray(st["loss"]))

    # ---- forward+backward only
    vg = jax.jit(jax.value_and_grad(cross_entropy_loss),
                 static_argnames=("cfg",))
    box = {}

    def fwdbwd_dispatch():
        box["loss"], box["g"] = vg(params, cfg, x, y)

    run_phase("fwd+bwd", fwdbwd_dispatch, lambda: np.asarray(box["loss"]))

    # ---- forward only
    fwd = jax.jit(cross_entropy_loss, static_argnames=("cfg",))
    run_phase("fwd only",
              lambda: box.__setitem__("l2", fwd(params, cfg, x, y)),
              lambda: np.asarray(box["l2"]))

    # ---- optimizer alone (fixed grads, real donated adam chain)
    _, grads0 = vg(params, cfg, x, y)

    @jax.jit
    def adam_step(p_, o_):
        updates, o_ = tx.update(grads0, o_, p_)
        return optax.apply_updates(p_, updates), o_

    ad = {"p": jax.tree_util.tree_map(jnp.array, params),
          "o": tx.init(params)}

    def adam_dispatch():
        ad["p"], ad["o"] = adam_step(ad["p"], ad["o"])

    run_phase("adam update", adam_dispatch,
              lambda: np.asarray(ad["p"]["end2"]["b"][0]))

    # ---- embed forward
    emb = jax.jit(embed_inputs, static_argnames=("cfg",))
    run_phase("embed fwd",
              lambda: box.__setitem__("h", emb(params, cfg, x)),
              lambda: np.asarray(box["h"][0, 0, 0]))

    if cfg.trunk_kernel:
        h0 = embed_inputs(params, cfg, x)
        win = cfg.receptive_field + out_len - 1
        h0 = jnp.asarray(h0[:, h0.shape[1] - win:])
        cdt = cfg.compute_dtype

        # ---- kernel forward (primal path: no activation saves)
        kf = jax.jit(lambda p_, h_: fused_trunk(p_, cfg, h_, out_len,
                                                raw=True, out_dtype=cdt))
        run_phase("kernel fwd",
                  lambda: box.__setitem__("u", kf(params, h0)),
                  lambda: np.asarray(box["u"][0, 0, 0, 0, 0]))

        # ---- kernel forward+backward (save path + reverse-walk kernel)
        kg = jax.jit(jax.grad(lambda p_, h_: jnp.sum(
            fused_trunk(p_, cfg, h_, out_len, raw=True,
                        out_dtype=cdt).astype(jnp.float32))))
        run_phase("kernel fwd+bwd",
                  lambda: box.__setitem__("kg", kg(params, h0)),
                  lambda: np.asarray(box["kg"]["layers"]["w_res"][0, 0, 0]))

        # ---- tail: skip contraction + head + CE, fwd+bwd, given u5
        u5 = jnp.asarray(kf(params, h0))
        N = B

        def tail_loss(p_, u5_):
            lp = p_["layers"]
            skip = lax.dot_general(
                u5_.astype(cdt), lp["w_skip"].astype(cdt),
                (((1, 3), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(N, out_len, cfg.skip_channels)
            if "b_skip" in lp:
                skip = skip + jnp.sum(lp["b_skip"], axis=0)
            yh = jax.nn.relu(skip)
            yh = jax.nn.relu(
                jnp.matmul(yh.astype(cdt), p_["end1"]["w"].astype(cdt),
                           preferred_element_type=jnp.float32)
                + p_["end1"]["b"]
            )
            logits = jnp.matmul(
                yh.astype(cdt), p_["end2"]["w"].astype(cdt),
                preferred_element_type=jnp.float32,
            ) + p_["end2"]["b"]
            return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                logits, y))

        tg = jax.jit(jax.grad(tail_loss))
        run_phase("tail fwd+bwd (skip dot+head+loss)",
                  lambda: box.__setitem__("tg", tg(params, u5)),
                  lambda: np.asarray(box["tg"]["end2"]["b"][0]))

    # ---- report
    step = results["full step"]
    flops = 3 * trunk_flops(cfg, B)
    print(f"\n{'phase':<38}{'ms':>9}{'% of step':>11}")
    for k, v in results.items():
        print(f"{k:<38}{v*1e3:>9.3f}{100*v/step:>10.1f}%")
    acc = sum(v for k, v in results.items() if k in
              ("embed fwd", "kernel fwd+bwd",
               "tail fwd+bwd (skip dot+head+loss)", "adam update"))
    if cfg.trunk_kernel:
        print(f"{'sum(embed+kernel+tail+adam)':<38}{acc*1e3:>9.3f}"
              f"{100*acc/step:>10.1f}%")
    print(f"\nfull step: {step*1e3:.3f} ms  "
          f"{flops/step/1e12:.1f} TFLOP/s effective "
          f"({flops/1e9:.1f} GFLOP fwd+2bwd)", flush=True)


if __name__ == "__main__":
    main()
