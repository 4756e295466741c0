"""mu-law companding codec.

Behavioral parity with the reference codec (reference: audio_data.py:133-158),
including its quirks, which matter for bit-exact round trips:

* the companding constant is ``mu = classes`` (256), not ``classes - 1``;
* quantization digitizes against ``classes`` bin *edges* ``linspace(-1, 1,
  classes)`` and subtracts 1 (reference: audio_data.py:133-137);
* decoding maps class ``q`` to ``(q / classes) * 2 - 1`` — bin edges, not
  centers (reference: wavenet_model.py:296,231).

Both numpy (host featurization path) and jax.numpy (on-device path)
implementations are provided; the jnp versions are jit/vmap friendly.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------- numpy (host)


def mu_law_encoding(data: np.ndarray, mu: int) -> np.ndarray:
    """Compand waveform in [-1, 1] to mu-law space [-1, 1]."""
    data = np.asarray(data)
    return np.sign(data) * np.log1p(mu * np.abs(data)) / np.log1p(mu)


def mu_law_expansion(data: np.ndarray, mu: int) -> np.ndarray:
    """Inverse of :func:`mu_law_encoding`."""
    data = np.asarray(data)
    return np.sign(data) * (np.exp(np.abs(data) * np.log1p(mu)) - 1) / mu


def quantize_data(data: np.ndarray, classes: int) -> np.ndarray:
    """Waveform in [-1, 1] -> integer classes in [0, classes-1]."""
    mu_x = mu_law_encoding(data, classes)
    bins = np.linspace(-1, 1, classes)
    return np.digitize(mu_x, bins) - 1


def dequantize_data(quantized: np.ndarray, classes: int) -> np.ndarray:
    """Integer classes -> waveform, via the reference's edge-based decode."""
    x = (np.asarray(quantized, dtype=np.float64) / classes) * 2.0 - 1.0
    return mu_law_expansion(x, classes)


def dequantize_to_f32(quantized: np.ndarray, classes: int) -> np.ndarray:
    """Host-side class -> float32 waveform decode that stays in float32
    end-to-end, matching the on-device decode (models/generate.py) bitwise —
    serving paths that must byte-match a device rollout use this one."""
    cls = np.asarray(quantized)
    return mu_law_expansion(
        (cls.astype(np.float32) / classes) * 2.0 - 1.0, classes
    ).astype(np.float32)


# ------------------------------------------------------------- jnp (on device)


def mu_law_encoding_jnp(data: jnp.ndarray, mu: int) -> jnp.ndarray:
    return jnp.sign(data) * jnp.log1p(mu * jnp.abs(data)) / jnp.log1p(float(mu))


def mu_law_expansion_jnp(data: jnp.ndarray, mu: int) -> jnp.ndarray:
    return jnp.sign(data) * (jnp.exp(jnp.abs(data) * jnp.log1p(float(mu))) - 1.0) / mu


def quantize_data_jnp(data: jnp.ndarray, classes: int) -> jnp.ndarray:
    mu_x = mu_law_encoding_jnp(data, classes)
    bins = jnp.linspace(-1.0, 1.0, classes)
    return jnp.digitize(mu_x, bins) - 1


def dequantize_data_jnp(quantized: jnp.ndarray, classes: int) -> jnp.ndarray:
    x = (quantized.astype(jnp.float32) / classes) * 2.0 - 1.0
    return mu_law_expansion_jnp(x, classes)
