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


class EmaState(NamedTuple):
    inner: optax.OptState
    ema: optax.Params


def with_ema(tx: optax.GradientTransformation,
             decay: float = 0.9999) -> optax.GradientTransformation:
    """Track an exponential moving average of the PARAMETERS alongside
    ``tx``: after each applied update, ``ema = decay * ema +
    (1 - decay) * new_params``. The EMA rides the optimizer state, so
    snapshots/exact-resume/sharding need nothing new; extract it with
    :func:`ema_params` (live state) or :func:`find_ema_state_dict` (a raw
    checkpoint blob). Parallel-WaveNet-style deployments generate from
    the averaged weights (no reference analogue — torch 0.3 training
    keeps only the live weights)."""

    def init(params):
        return EmaState(tx.init(params),
                        jax.tree_util.tree_map(jnp.asarray, params))

    def update(grads, state, params=None):
        updates, inner = tx.update(grads, state.inner, params)
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p,
            state.ema, new_params)
        return updates, EmaState(inner, ema)

    return optax.GradientTransformation(init, update)


def ema_params(opt_state):
    """Pull the EMA parameter tree out of a live optimizer state built
    with :func:`with_ema` (at any wrapping depth); None if absent."""
    found = []

    def walk(s):
        if isinstance(s, EmaState):
            found.append(s.ema)
            return
        if isinstance(s, tuple):
            for c in s:
                walk(c)

    walk(opt_state)
    return found[0] if found else None


def find_ema_state_dict(opt_state_dict):
    """Locate the EMA subtree in a DESERIALIZED checkpoint's opt_state
    state-dict (EmaState serializes its fields by name); None if absent.
    Restore with ``flax.serialization.from_state_dict(params, found)``."""
    if isinstance(opt_state_dict, dict):
        if "ema" in opt_state_dict and "inner" in opt_state_dict:
            return opt_state_dict["ema"]
        for v in opt_state_dict.values():
            got = find_ema_state_dict(v)
            if got is not None:
                return got
    return None
