"""Optimizers.

``sgd_normalized`` reproduces the reference's custom ``SGDNormalized``
(reference: optimizers.py:4-102) as an optax gradient transformation: the raw
step is ``lr * g / ||g||_2`` *per parameter tensor*, then the usual
weight-decay / momentum / Nesterov machinery in the reference's order
(reference: optimizers.py:84-100)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class SGDNormalizedState(NamedTuple):
    momentum: optax.Updates | None


def sgd_normalized(
    lr: float = 1e-4,
    momentum: float = 0.0,
    dampening: float = 0.0,
    weight_decay: float = 0.0,
    nesterov: bool = False,
) -> optax.GradientTransformation:
    if nesterov and (momentum <= 0 or dampening != 0):
        raise ValueError("Nesterov momentum requires a momentum and zero dampening")

    def init_fn(params):
        mom = (
            jax.tree_util.tree_map(jnp.zeros_like, params) if momentum != 0 else None
        )
        return SGDNormalizedState(momentum=mom)

    def update_fn(updates, state, params=None):
        # d_p = (lr/||g||) * g  (reference: optimizers.py:84-85)
        def normed(g):
            n = jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2))
            return (lr / jnp.maximum(n, 1e-12)) * g

        d_p = jax.tree_util.tree_map(normed, updates)
        if weight_decay != 0:
            # d_p += wd * p (reference: optimizers.py:86-87)
            d_p = jax.tree_util.tree_map(
                lambda d, p: d + weight_decay * p, d_p, params
            )
        new_mom = state.momentum
        if momentum != 0:
            # buf = momentum*buf + (1-dampening)*d_p; first step buf = d_p
            # (reference: optimizers.py:89-98). Zero-init + the same formula
            # differs from torch's clone-on-first-step only by a (1-dampening)
            # factor on step one; with the default dampening=0 it is exact.
            new_mom = jax.tree_util.tree_map(
                lambda b, d: momentum * b + (1 - dampening) * d, state.momentum, d_p
            )
            if nesterov:
                d_p = jax.tree_util.tree_map(
                    lambda d, b: d + momentum * b, d_p, new_mom
                )
            else:
                d_p = new_mom
        # p <- p - d_p (reference: optimizers.py:100); optax applies +updates
        neg = jax.tree_util.tree_map(lambda d: -d, d_p)
        return neg, SGDNormalizedState(momentum=new_mom)

    return optax.GradientTransformation(init_fn, update_fn)


def reference_adam(
    lr, weight_decay: float = 0.0, gradient_clipping: float | None = None
) -> optax.GradientTransformation:
    """The reference trainer's default optimizer stack: optional
    clip_grad_norm, then Adam with L2-style weight decay folded into the
    gradient (torch semantics; reference: wavenet_training.py:41,74-76).
    ``lr`` may be a float or an optax schedule (see :func:`lr_schedule`);
    a float reproduces the reference's constant-lr behavior exactly."""
    chain = []
    if gradient_clipping is not None:
        chain.append(optax.clip_by_global_norm(gradient_clipping))
    if weight_decay != 0.0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    chain.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*chain)


def lr_schedule(
    lr: float,
    kind: str = "constant",
    warmup_steps: int = 0,
    decay_steps: int | None = None,
    min_lr_ratio: float = 0.0,
):
    """Learning-rate schedule factory for :func:`reference_adam` and the
    train CLI. ``kind``: ``constant`` | ``cosine`` (decay to
    ``lr * min_lr_ratio`` over ``decay_steps``) | ``exponential``
    (``lr * min_lr_ratio ** (step / decay_steps)``). ``warmup_steps``
    prepends a linear 0 -> lr ramp. Returns a plain float when the result
    is a constant (so the optimizer state stays schedule-free). No
    reference analogue (the reference hard-codes a constant lr,
    train_script.py:70)."""
    if kind == "constant":
        main = None if not warmup_steps else optax.constant_schedule(lr)
    elif kind == "cosine":
        if not decay_steps:
            raise ValueError("cosine schedule needs decay_steps")
        main = optax.cosine_decay_schedule(lr, decay_steps,
                                           alpha=min_lr_ratio)
    elif kind == "exponential":
        if not decay_steps:
            raise ValueError("exponential schedule needs decay_steps")
        if not 0.0 < min_lr_ratio < 1.0:
            raise ValueError("exponential schedule needs min_lr_ratio "
                             "in (0, 1) — the decay per decay_steps")
        main = optax.exponential_decay(lr, decay_steps,
                                       decay_rate=min_lr_ratio)
    else:
        raise ValueError(f"unknown schedule kind {kind!r}")
    if main is None:
        return lr
    if not warmup_steps:
        return main
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup_steps), main],
        [warmup_steps],
    )
