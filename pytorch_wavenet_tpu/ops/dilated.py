"""Dilation utilities — reference L0 API parity.

The TPU trunk does NOT use batch folding (XLA handles dilated convs as
shifted matmuls directly; see models/wavenet.py), but the reference's
``dilate`` / ``constant_pad_1d`` are public L0 API (reference:
wavenet_modules.py:10-39,80-127) used by downstream code and tests, so
functionally-equivalent jnp versions live here.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def constant_pad_1d(
    x: jnp.ndarray,
    target_size: int,
    dimension: int = 0,
    value: float = 0,
    pad_start: bool = False,
) -> jnp.ndarray:
    """Pad ``dimension`` up to ``target_size`` with ``value``, at the start
    or the end (reference: wavenet_modules.py:80-127). Differentiable: the
    gradient crops back, which jnp.pad's vjp already does (the reference
    needed a hand-written backward for this, wavenet_modules.py:108-119)."""
    num_pad = target_size - x.shape[dimension]
    if num_pad < 0:
        raise ValueError("target size has to be greater than input size")
    if num_pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[dimension] = (num_pad, 0) if pad_start else (0, num_pad)
    return jnp.pad(x, widths, constant_values=value)


def dilate(
    x: jnp.ndarray, dilation: int, init_dilation: int = 1, pad_start: bool = True
) -> jnp.ndarray:
    """Reshape ``(N, C, L)`` so the batch dim carries the dilation factor
    (reference: wavenet_modules.py:10-39): output is
    ``(dilation, C, L * N / dilation)``, zero-padded at the start if L is
    not divisible. Provided for reference API compatibility and as the
    executable spec the reference's dilate tests pin
    (tests/test_modules.py:8-36)."""
    n, c, l = x.shape
    dilation_factor = dilation / init_dilation
    if dilation_factor == 1:
        return x

    new_l = int(np.ceil(l / dilation_factor) * dilation_factor)
    if new_l != l:
        l = new_l
        x = constant_pad_1d(x, new_l, dimension=2, pad_start=pad_start)

    l = math.ceil(l * init_dilation / dilation)
    n = math.ceil(n * dilation / init_dilation)

    # (n, c, l) -> (c, l, n) -> view (c, l', n') -> (n', c, l')
    x = jnp.transpose(x, (1, 2, 0))
    x = x.reshape(c, l, n)
    return jnp.transpose(x, (2, 0, 1))
