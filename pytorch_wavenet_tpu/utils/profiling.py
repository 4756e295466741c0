"""Profiling and tracing.

The reference profiles interactively with torch.autograd.profiler and a
chrome-trace export (reference: profiling.ipynb cells 3-5) plus ad-hoc
wall-clock prints at step 100 (reference: wavenet_training.py:79-82,
wavenet_model.py:304-306). TPU equivalents: jax.profiler traces viewable in
TensorBoard/Perfetto, a step timer with warmup-aware statistics, and an
analytic roofline helper for the trunk.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax

from ..config import WaveNetConfig


@contextlib.contextmanager
def trace(log_dir: str = "profiles"):
    """Capture a device trace (open in TensorBoard's profile plugin or
    Perfetto). Replaces torch.autograd.profiler + export_chrome_trace
    (reference: profiling.ipynb cell 4)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Wall-clock step statistics with warmup discard (the reference's
    one-shot print at step 100 becomes a running measurement)."""

    warmup: int = 3
    times: list = field(default_factory=list)
    _t0: float | None = None
    _seen: int = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)
        return False

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    @property
    def best(self) -> float:
        return min(self.times) if self.times else float("nan")

    def summary(self) -> str:
        return f"{self.mean*1e3:.3f} ms/step (best {self.best*1e3:.3f} ms, n={len(self.times)})"


def trunk_flops(cfg: WaveNetConfig, batch: int, length: int | None = None,
                out_len: int | None = None) -> int:
    """Analytic forward FLOPs of the trunk (for roofline/efficiency numbers).

    Counts the matmuls as 2*M*K*N: start embed is a gather (0 FLOPs for int
    inputs); per layer k tap-matmuls into 2D channels, residual D->R over the
    full length, skip D->S over out_len only; head over out_len.
    """
    if length is None:
        length = cfg.item_length
    if out_len is None:
        out_len = cfg.output_length
    R, D, S, E, C = (
        cfg.residual_channels, cfg.dilation_channels, cfg.skip_channels,
        cfg.end_channels, cfg.classes,
    )
    per_layer = (
        2 * length * R * (2 * D) * cfg.kernel_size  # gated conv taps
        + 2 * length * D * R  # residual 1x1
        + 2 * out_len * D * S  # skip 1x1 (tail only)
    )
    head = 2 * out_len * (S * E + E * C)
    return batch * (cfg.num_layers * per_layer + head)


def generation_step_flops(cfg: WaveNetConfig, streams: int = 1) -> int:
    """FLOPs of one autoregressive generation step (all layers + head)."""
    return trunk_flops(cfg, streams, length=1, out_len=1)


def hbm_bytes_per_gen_step(cfg: WaveNetConfig, streams: int = 1,
                           dtype_bytes: int = 4) -> int:
    """Memory traffic of one generation step: all weights + one ring-buffer
    column per layer (read k-1 taps, write 1) + activations. Weight reads
    dominate for small stream counts — generation is bandwidth-bound."""
    weights = cfg.parameter_count() * dtype_bytes
    queue = cfg.num_layers * streams * cfg.kernel_size * cfg.residual_channels * dtype_bytes
    return weights + queue
