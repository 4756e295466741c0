"""mu-law codec tests.

Golden semantics from the reference codec (reference: audio_data.py:133-158)
and the edge-based decode (reference: wavenet_model.py:296).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pytorch_wavenet_tpu.ops.mulaw import (
    mu_law_encoding,
    mu_law_expansion,
    quantize_data,
    dequantize_data,
    mu_law_encoding_jnp,
    mu_law_expansion_jnp,
    quantize_data_jnp,
)

CLASSES = 256


def test_encode_expand_roundtrip():
    x = np.linspace(-1, 1, 1001)
    y = mu_law_expansion(mu_law_encoding(x, CLASSES), CLASSES)
    np.testing.assert_allclose(y, x, atol=1e-12)


def test_encode_range_and_sign():
    x = np.linspace(-1, 1, 101)
    y = mu_law_encoding(x, CLASSES)
    assert np.all(np.abs(y) <= 1 + 1e-12)
    np.testing.assert_array_equal(np.sign(y), np.sign(x))
    assert mu_law_encoding(np.array([0.0]), CLASSES)[0] == 0.0


def test_quantize_boundaries():
    # digitize against classes bin edges then -1 (reference: audio_data.py:133-137)
    q = quantize_data(np.array([-1.0, 0.0, 1.0]), CLASSES)
    assert q[0] == 0
    assert q[2] == CLASSES - 1
    # zero encodes to 0.0 which lands in the middle of the edge grid
    assert q[1] in (CLASSES // 2 - 1, CLASSES // 2)


def test_quantize_is_digitize_semantics():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, 1000)
    q = quantize_data(x, CLASSES)
    mu_x = np.sign(x) * np.log(1 + CLASSES * np.abs(x)) / np.log(CLASSES + 1)
    bins = np.linspace(-1, 1, CLASSES)
    expected = np.digitize(mu_x, bins) - 1
    np.testing.assert_array_equal(q, expected)
    assert q.min() >= 0 and q.max() <= CLASSES - 1


def test_dequantize_uses_bin_edges():
    # class q decodes via (q/classes)*2-1 — the reference's edge-based decode
    # (reference: wavenet_model.py:296), NOT bin centers.
    q = np.array([0, CLASSES // 2, CLASSES - 1])
    x = (q / CLASSES) * 2.0 - 1.0
    expected = np.sign(x) * (np.exp(np.abs(x) * np.log(1 + CLASSES)) - 1) / CLASSES
    np.testing.assert_allclose(dequantize_data(q, CLASSES), expected, rtol=1e-12)


def test_quantize_dequantize_small_error():
    x = np.linspace(-0.95, 0.95, 4001)
    y = dequantize_data(quantize_data(x, CLASSES), CLASSES)
    # mu-law quantization error: the outermost bins are ~0.04 wide in signal
    # space and the reference decodes to bin *edges* (wavenet_model.py:296),
    # so worst case is one bin width; typical error is much smaller.
    assert np.max(np.abs(y - x)) < 0.09
    assert np.mean(np.abs(y - x)) < 0.03


@pytest.mark.parametrize("mu", [16, 256])
def test_jnp_matches_numpy(mu):
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, 500).astype(np.float32)
    # f32 transcendentals vs numpy's f64: small absolute slack
    np.testing.assert_allclose(
        np.asarray(mu_law_encoding_jnp(jnp.asarray(x), mu)),
        mu_law_encoding(x, mu),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(mu_law_expansion_jnp(jnp.asarray(x), mu)),
        mu_law_expansion(x, mu),
        atol=1e-4,
    )
    # quantization may differ by at most one class where f32 rounding
    # straddles a bin edge, and only rarely
    qj = np.asarray(quantize_data_jnp(jnp.asarray(x), mu))
    qn = quantize_data(x, mu)
    diff = np.abs(qj - qn)
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.02
