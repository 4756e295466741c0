"""Functional dilated queue — reference L0 API parity.

The production fast-generation path keeps all queues as one stacked ring
buffer updated inside ``lax.scan``/Pallas (models/generate.py,
ops/pallas/gen_kernel.py). This module provides the reference's standalone
``DilatedQueue`` object (reference: wavenet_modules.py:42-77) as an
immutable-value API for users and for the queue-behavior tests the
reference pins (tests/test_tensor_queue.py:12-51)."""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax.numpy as jnp


@dataclass(frozen=True)
class DilatedQueue:
    """Ring buffer ``(num_channels, max_length)`` with enqueue/dequeue
    cursors. Methods return a new queue (values are immutable jnp arrays)."""

    data: jnp.ndarray
    in_pos: int = 0
    out_pos: int = 0
    dilation: int = 1
    num_deq: int = 1

    @classmethod
    def create(cls, max_length: int, num_channels: int = 1, dilation: int = 1,
               num_deq: int = 1, dtype=jnp.float32) -> "DilatedQueue":
        return cls(
            data=jnp.zeros((num_channels, max_length), dtype),
            dilation=dilation,
            num_deq=num_deq,
        )

    @property
    def max_length(self) -> int:
        return self.data.shape[1]

    @property
    def num_channels(self) -> int:
        return self.data.shape[0]

    def enqueue(self, value: jnp.ndarray) -> "DilatedQueue":
        """Write one column at in_pos (reference: wavenet_modules.py:55-57)."""
        data = self.data.at[:, self.in_pos].set(value)
        return replace(self, data=data,
                       in_pos=(self.in_pos + 1) % self.max_length)

    def dequeue(self, num_deq: int = 1, dilation: int = 1):
        """Gather ``num_deq`` taps spaced ``dilation`` apart ending at
        out_pos, with wrap-around (reference: wavenet_modules.py:59-72).
        Returns ``(taps (num_channels, num_deq), new_queue)``."""
        start = self.out_pos - (num_deq - 1) * dilation
        if start < 0:
            t1 = self.data[:, start::dilation]
            t2 = self.data[:, self.out_pos % dilation : self.out_pos + 1 : dilation]
            t = jnp.concatenate((t1, t2), axis=1)
        else:
            t = self.data[:, start : self.out_pos + 1 : dilation]
        return t, replace(self, out_pos=(self.out_pos + 1) % self.max_length)

    def reset(self) -> "DilatedQueue":
        """Zero-fill and rewind (reference: wavenet_modules.py:74-77)."""
        return replace(self, data=jnp.zeros_like(self.data), in_pos=0, out_pos=0)
