"""L0 op tests mirroring the reference's golden specs.

``dilate`` round trips reproduce reference tests/test_modules.py:8-36;
``DilatedQueue`` behavior reproduces tests/test_tensor_queue.py:12-51
including the interleaved-enqueue/dequeue invariant d[0][0] == max(i-7, 0);
``constant_pad_1d`` forward/backward reproduces tests/test_tensor_queue.py:
103-131 (the gradient must crop)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_wavenet_tpu.ops.dilated import dilate, constant_pad_1d
from pytorch_wavenet_tpu.ops.queues import DilatedQueue


def test_dilate_roundtrip_1_2_4():
    """Exact shape and element assertions for 1->2->4->1 re-dilation
    (reference: tests/test_modules.py:8-36)."""
    x = jnp.arange(1, 13, dtype=jnp.float32).reshape(1, 1, 12)

    d2 = dilate(x, 2)
    assert d2.shape == (2, 1, 6)
    # even positions in row 0, odd in row 1
    np.testing.assert_array_equal(np.asarray(d2[0, 0]), [1, 3, 5, 7, 9, 11])
    np.testing.assert_array_equal(np.asarray(d2[1, 0]), [2, 4, 6, 8, 10, 12])

    d4 = dilate(d2, 4, init_dilation=2)
    assert d4.shape == (4, 1, 3)
    np.testing.assert_array_equal(np.asarray(d4[0, 0]), [1, 5, 9])
    np.testing.assert_array_equal(np.asarray(d4[3, 0]), [4, 8, 12])

    back = dilate(d4, 1, init_dilation=4)
    assert back.shape == (1, 1, 12)
    np.testing.assert_array_equal(np.asarray(back[0, 0]), np.arange(1, 13))


def test_dilate_pads_when_not_divisible():
    x = jnp.arange(1, 11, dtype=jnp.float32).reshape(1, 1, 10)
    d4 = dilate(x, 4)
    assert d4.shape == (4, 1, 3)
    # two zeros padded at the start
    flat = np.asarray(dilate(d4, 1, init_dilation=4)[0, 0])
    np.testing.assert_array_equal(flat[:2], [0, 0])
    np.testing.assert_array_equal(flat[2:], np.arange(1, 11))


def test_dilate_multichannel():
    x = jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4)
    d = dilate(x, 4, init_dilation=2)
    assert d.shape == (4, 3, 2)
    assert dilate(x, 2, init_dilation=2) is x  # no-op fast path


def test_queue_enqueue_wraparound():
    """Values wrap once max_length is exceeded
    (reference: tests/test_tensor_queue.py:13-24)."""
    q = DilatedQueue.create(max_length=8, num_channels=1)
    for i in range(12):
        q = q.enqueue(jnp.asarray([float(i + 1)]))
    np.testing.assert_array_equal(
        np.asarray(q.data[0]), [9, 10, 11, 12, 5, 6, 7, 8]
    )


def test_queue_strided_dequeue():
    """Dequeue num_deq taps spaced dilation apart
    (reference: tests/test_tensor_queue.py:26-41)."""
    q = DilatedQueue.create(max_length=8, num_channels=1)
    for i in range(8):
        q = q.enqueue(jnp.asarray([float(i + 1)]))
    # out_pos 0: taps at -2, -1... start = 0 - 1*2 = -2 -> wraps
    t, q = q.dequeue(num_deq=2, dilation=2)
    np.testing.assert_array_equal(np.asarray(t[0]), [7, 1])
    t, q = q.dequeue(num_deq=2, dilation=2)
    np.testing.assert_array_equal(np.asarray(t[0]), [8, 2])


def test_queue_interleaved_invariant():
    """The reference's interleaved enqueue/dequeue invariant:
    after i enqueues, the first of 8 dilation-1 taps is max(i-7, 0)
    (reference: tests/test_tensor_queue.py:43-50)."""
    q = DilatedQueue.create(max_length=8, num_channels=1)
    for i in range(20):
        q = q.enqueue(jnp.asarray([float(i + 1)]))
        t, q = q.dequeue(num_deq=8, dilation=1)
        assert float(t[0][0]) == max(i + 1 - 7, 0)


def test_queue_reset():
    q = DilatedQueue.create(max_length=4, num_channels=2)
    q = q.enqueue(jnp.asarray([1.0, 2.0]))
    q = q.reset()
    assert float(jnp.abs(q.data).max()) == 0.0
    assert q.in_pos == 0 and q.out_pos == 0


def test_constant_pad_forward():
    x = jnp.ones((2, 3))
    p = constant_pad_1d(x, 5, dimension=1, value=7.0, pad_start=True)
    assert p.shape == (2, 5)
    np.testing.assert_array_equal(np.asarray(p[:, :2]), np.full((2, 2), 7.0))
    np.testing.assert_array_equal(np.asarray(p[:, 2:]), np.ones((2, 3)))


def test_constant_pad_backward_crops():
    """Gradient through the pad crops back to the input region
    (reference hand-writes this backward, wavenet_modules.py:108-119)."""
    x = jnp.arange(6, dtype=jnp.float32).reshape(1, 6)

    def f(x):
        p = constant_pad_1d(x, 10, dimension=1, pad_start=True)
        w = jnp.arange(10, dtype=jnp.float32)
        return jnp.sum(p * w)

    g = jax.grad(f)(x)
    # padded positions 0..3 get weights 0..3 but contribute no gradient to x;
    # x[j] aligns with padded position 4+j -> grad = w[4+j]
    np.testing.assert_array_equal(np.asarray(g[0]), np.arange(4, 10))


def test_constant_pad_rejects_shrink():
    import pytest

    with pytest.raises(ValueError):
        constant_pad_1d(jnp.ones((3,)), 2)
