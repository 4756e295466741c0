#!/usr/bin/env python
"""Training-step phase attribution (VERDICT r3 #2).

Times each component of the trunk-kernel training step in isolation —
embed, kernel forward, kernel forward+backward, the skip/head/loss tail,
and the optimizer — so the step's cost is attributed, not guessed.

Methodology (CLAUDE.md environment rules): every measurement is K
iterations of a ``lax.scan`` inside ONE jitted dispatch (the ~26 ms tunnel
dispatch latency never touches the numbers), min over ``--reps`` dispatches.
Loop-invariant hoisting is defeated by threading a carried scalar into each
iteration's inputs at 1e-30 scale (not removable by the algebraic
simplifier, immeasurable in cost).

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


def scan_timed(make_body, init_carry, iters, reps):
    """Build jit(scan(body)), run once to compile, then min-of-reps of the
    per-iteration time (single dispatch per rep)."""

    @jax.jit
    def run(carry):
        carry, _ = lax.scan(
            lambda c, _: (make_body(c), None), carry, None, length=iters
        )
        return jax.tree_util.tree_map(
            lambda x: jnp.sum(x) if hasattr(x, "sum") else x, carry
        )

    out = run(init_carry)
    jax.tree_util.tree_map(np.asarray, out)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(init_carry)
        jax.tree_util.tree_map(np.asarray, out)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def perturb(tree, eps):
    """Inject a carried-scalar dependence: x + eps*1e-30 for float leaves."""
    return jax.tree_util.tree_map(
        lambda x: x + (eps * 1e-30).astype(x.dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


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

    import pytorch_wavenet_tpu as wt
    from pytorch_wavenet_tpu.models.wavenet import embed_inputs
    from pytorch_wavenet_tpu.ops.pallas.trunk_kernel import fused_trunk
    from pytorch_wavenet_tpu.training.trainer import cross_entropy_loss
    from pytorch_wavenet_tpu.utils.profiling import trunk_flops

    cfg = wt.get_config(args.config, trunk_kernel=not args.xla_trunk)
    B = args.batch_size
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    tx = wt.reference_adam(1e-4)
    opt_state = tx.init(params)
    x = jax.random.randint(
        jax.random.PRNGKey(1), (B, cfg.item_length), 0, cfg.classes
    )
    y = jax.random.randint(
        jax.random.PRNGKey(2), (B, cfg.output_length), 0, cfg.classes
    )
    out_len = cfg.output_length
    print(f"platform={jax.devices()[0].platform} config={args.config} "
          f"B={B} out={out_len} trunk_kernel={cfg.trunk_kernel} "
          f"iters={args.iters} reps={args.reps}")

    results = {}

    # ---- full step: fwd + bwd + adam (the production train_step math)
    def full_body(c):
        p_, o_ = c
        loss, grads = jax.value_and_grad(cross_entropy_loss)(p_, cfg, x, y)
        import optax

        updates, o_ = tx.update(grads, o_, p_)
        p_ = optax.apply_updates(p_, updates)
        return (p_, o_)

    results["full step"] = scan_timed(full_body, (params, opt_state),
                                      args.iters, args.reps)

    # ---- forward+backward only (tiny SGD carry keeps the loop live)
    def fwdbwd_body(p_):
        loss, grads = jax.value_and_grad(cross_entropy_loss)(p_, cfg, x, y)
        return jax.tree_util.tree_map(lambda a, g: a - 1e-30 * g, p_, grads)

    results["fwd+bwd"] = scan_timed(fwdbwd_body, params, args.iters,
                                    args.reps)

    # ---- forward only
    def fwd_body(c):
        p_, acc = c
        loss = cross_entropy_loss(perturb(p_, acc), cfg, x, y)
        return (p_, loss)

    results["fwd only"] = scan_timed(
        fwd_body, (params, jnp.float32(0)), args.iters, args.reps
    )

    # ---- optimizer alone (fixed grads; carry is the real adam state)
    _, grads0 = jax.value_and_grad(cross_entropy_loss)(params, cfg, x, y)

    def adam_body(c):
        import optax

        p_, o_ = c
        updates, o_ = tx.update(grads0, o_, p_)
        return (optax.apply_updates(p_, updates), o_)

    results["adam update"] = scan_timed(adam_body, (params, opt_state),
                                        args.iters, args.reps)

    # ---- embed forward
    def embed_body(c):
        p_, acc = c
        h = embed_inputs(perturb(p_, acc), cfg, x)
        return (p_, jnp.sum(h) * 1e-30)

    results["embed fwd"] = scan_timed(
        embed_body, (params, jnp.float32(0)), args.iters, args.reps
    )

    if cfg.trunk_kernel:
        h0 = embed_inputs(params, cfg, x)
        win = cfg.receptive_field + out_len - 1
        h0 = h0[:, h0.shape[1] - win:]
        cdt = cfg.compute_dtype

        # ---- kernel forward (primal path: no activation saves)
        def kfwd_body(c):
            p_, acc = c
            u = fused_trunk(perturb(p_, acc), cfg, h0, out_len, raw=True,
                            out_dtype=cdt)
            return (p_, jnp.sum(u.astype(jnp.float32)) * 1e-30)

        results["kernel fwd"] = scan_timed(
            kfwd_body, (params, jnp.float32(0)), args.iters, args.reps
        )

        # ---- kernel forward+backward (save path + reverse-walk kernel)
        def kfwdbwd_body(p_):
            def f(pp):
                u = fused_trunk(pp, cfg, h0, out_len, raw=True,
                                out_dtype=cdt)
                return jnp.sum(u.astype(jnp.float32))

            g = jax.grad(f)(p_)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-30 * b, p_, g)

        results["kernel fwd+bwd"] = scan_timed(kfwdbwd_body, params,
                                               args.iters, args.reps)

        # ---- tail: skip contraction + head + CE, fwd+bwd, given u5
        u5 = fused_trunk(params, cfg, h0, out_len, raw=True, out_dtype=cdt)
        L, D, N = cfg.num_layers, cfg.dilation_channels, B

        def tail_loss(p_, u5_):
            import optax

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

        def tail_body(p_):
            g = jax.grad(tail_loss)(p_, u5)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-30 * b, p_, g)

        results["tail fwd+bwd (skip dot+head+loss)"] = scan_timed(
            tail_body, params, args.iters, args.reps
        )

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
          f"({flops/1e9:.1f} GFLOP fwd+2bwd)")


if __name__ == "__main__":
    main()
