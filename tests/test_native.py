"""Native C++ featurization library tests: build, exact parity with the
numpy codec, and fallback behavior."""

import numpy as np
import pytest

from pytorch_wavenet_tpu.data import native
from pytorch_wavenet_tpu.ops.mulaw import (
    quantize_data,
    dequantize_data,
)


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_abi(lib):
    assert lib.native_abi_version() == 1


def test_quantize_matches_numpy(lib):
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, 20000).astype(np.float32)
    x = np.concatenate([x, np.asarray([-1.0, 0.0, 1.0], np.float32)])
    q_native = native.mu_law_quantize(x, 256)
    q_numpy = quantize_data(x.astype(np.float64), 256)
    diff = np.abs(q_native.astype(int) - q_numpy)
    # identical up to float32-vs-float64 edge rounding (at most 1 class,
    # vanishingly rare)
    assert diff.max() <= 1
    assert (diff != 0).mean() < 5e-3


def test_dequantize_matches_numpy(lib):
    q = np.arange(256, dtype=np.uint8)
    out = native.mu_law_dequantize(q, 256)
    expected = dequantize_data(q, 256)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_pcm16_mono_and_stereo(lib):
    pcm = np.asarray([0, 16384, -16384, 32767], np.int16)
    out = native.pcm16_to_float_mono(pcm, 1)
    np.testing.assert_allclose(out, [0.0, 0.5, -0.5, 32767 / 32768], atol=1e-6)
    stereo = np.asarray([16384, -16384, 32767, 32767], np.int16)
    out2 = native.pcm16_to_float_mono(stereo, 2)
    np.testing.assert_allclose(out2, [0.0, 32767 / 32768], atol=1e-4)


def test_gather_windows(lib):
    stream = np.arange(100, dtype=np.uint8)
    starts = np.asarray([0, 10, 50], np.int64)
    x, y = native.gather_windows(stream, starts, item_len=8, target_len=3)
    assert x.shape == (3, 8) and y.shape == (3, 3)
    np.testing.assert_array_equal(x[1], np.arange(10, 18))
    # target = last target_len of the (item_len+1)-sample window
    np.testing.assert_array_equal(y[1], np.arange(16, 19))


def test_gather_windows_fallback_parity(lib):
    """Native and numpy fallback produce identical results."""
    rng = np.random.default_rng(1)
    stream = rng.integers(0, 256, 5000).astype(np.uint8)
    starts = rng.integers(0, 4000, 16).astype(np.int64)
    xn, yn = native.gather_windows(stream, starts, 64, 8)
    # emulate fallback
    xf = np.stack([stream[s : s + 64] for s in starts]).astype(np.int32)
    yf = np.stack([stream[s + 64 + 1 - 8 : s + 65] for s in starts]).astype(np.int32)
    np.testing.assert_array_equal(xn, xf)
    np.testing.assert_array_equal(yn, yf)
