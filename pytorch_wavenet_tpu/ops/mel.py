"""Log-mel spectrogram featurization (for the mel-conditioned vocoder,
BASELINE.json config 5 — the reference has no conditioning; this is the
capability its WaveNet paper lineage implies for vocoder use).

Host (numpy) and device (jnp) implementations share the same filterbank
construction (HTK-style mel scale, Slaney-style area normalization off)."""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    num_mels: int = 80,
    n_fft: int = 1024,
    sampling_rate: int = 16000,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Triangular mel filterbank ``(n_fft//2 + 1, num_mels)``."""
    if fmax is None:
        fmax = sampling_rate / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sampling_rate / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), num_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fb = np.zeros((n_bins, num_mels), np.float32)
    for m in range(num_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb


@functools.lru_cache(maxsize=8)
def _hann_window(n_fft: int) -> np.ndarray:
    return np.hanning(n_fft + 1)[:-1].astype(np.float32)


def log_mel_spectrogram(
    wav: np.ndarray,
    num_mels: int = 80,
    n_fft: int = 1024,
    hop_length: int = 256,
    sampling_rate: int = 16000,
    eps: float = 1e-5,
) -> np.ndarray:
    """Waveform ``(..., T)`` -> log-mel frames ``(..., ceil(T/hop), num_mels)``.
    Center-padded (reflect) so frame i is centered on sample i*hop. Batched:
    leading axes are preserved, one vectorized FFT + one matmul for all
    items (no per-item work)."""
    wav = np.asarray(wav, np.float32)
    pad = n_fft // 2
    pad_width = [(0, 0)] * (wav.ndim - 1) + [(pad, pad)]
    x = np.pad(wav, pad_width, mode="reflect")
    n_frames = 1 + (x.shape[-1] - n_fft) // hop_length
    idx = np.arange(n_fft)[None, :] + hop_length * np.arange(n_frames)[:, None]
    frames = x[..., idx] * _hann_window(n_fft)  # (..., n_frames, n_fft)
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2  # power
    mel = spec @ mel_filterbank(num_mels, n_fft, sampling_rate)
    return np.log(mel + eps).astype(np.float32)


def _upsample_weights(xp, F: int, hop_length: int, length: int):
    t = xp.arange(length, dtype=xp.float32) / hop_length
    i0 = xp.clip(xp.floor(t).astype(xp.int32), 0, F - 1)
    i1 = xp.clip(i0 + 1, 0, F - 1)
    w = (t - i0.astype(xp.float32))[..., None]
    return i0, i1, w


def upsample_frames(frames: jnp.ndarray, hop_length: int, length: int) -> jnp.ndarray:
    """Linearly interpolate conditioning frames ``(..., F, M)`` to
    per-sample resolution ``(..., length, M)`` (frame i centered at sample
    i*hop). Device (jnp) version."""
    i0, i1, w = _upsample_weights(jnp, frames.shape[-2], hop_length, length)
    a = jnp.take(frames, i0, axis=-2)
    b = jnp.take(frames, i1, axis=-2)
    return a * (1.0 - w) + b * w


def upsample_frames_conv(
    up_params: dict, frames: jnp.ndarray, factors: tuple[int, ...], length: int
) -> jnp.ndarray:
    """Learnable transposed-conv upsampling of conditioning frames
    ``(..., F, M)`` to ``(..., length, M)``.

    Each stage ``i`` with stride ``r = factors[i]`` is a two-tap learned
    interpolation — a stride-``r`` transposed conv with kernel ``2r``, where
    every output sample mixes exactly its two bracketing inputs:

        out[..., f*r + j, :] = x[f] @ w[0, j] + x[min(f+1, F-1)] @ w[1, j]

    with ``w = up_params[f"s{i}"]`` of shape ``(2, r, M, M)``. Expressed as
    two batched (..., F, M) x (M, M) einsums per stage, so the whole
    upsampler runs as a handful of MXU matmuls — no gather, no dynamic
    shapes. With the linear-interpolation initialization
    (:func:`linear_init_upsampler` weights) the stack reproduces
    :func:`upsample_frames` exactly for any factorization, because linearly
    interpolating an already piecewise-linear signal on a finer grid is the
    identity refinement.
    """
    x = frames
    for i, r in enumerate(factors):
        w = up_params[f"s{i}"]  # (2, r, M, M)
        nxt = jnp.concatenate([x[..., 1:, :], x[..., -1:, :]], axis=-2)
        a = jnp.einsum("...fm,jmn->...fjn", x, w[0])
        b = jnp.einsum("...fm,jmn->...fjn", nxt, w[1])
        y = a + b  # (..., F, r, M)
        x = y.reshape(x.shape[:-2] + (x.shape[-2] * r, x.shape[-1]))
    if x.shape[-2] < length:
        raise ValueError(
            f"upsampled cond has {x.shape[-2]} rows "
            f"({frames.shape[-2]} frames x stride {factors}) but {length} "
            "samples were requested; provide more frames or larger factors"
        )
    return x[..., :length, :]


def frames_window_len(count: int, hop_length: int,
                      factors: tuple[int, ...] = ()) -> int:
    """Frame-slab length that :func:`expand_frames_window` needs to expand
    ``count`` rows starting at any in-frame phase: the forward footprint of
    a row is its two bracketing frames (linear) or one frame per conv stage,
    plus one guard frame so the conv stack's in-slab end clamp can never
    touch a gathered row before the true timeline end."""
    return count // hop_length + 3 + len(factors)


def expand_frames_window(params, frames, hop_length: int, phase,
                         count: int, factors: tuple[int, ...] = ()):
    """Expand a per-lane conditioning frame slab to ``count`` sample-rate
    rows, bitwise CHUNK-INVARIANT: expanding rows ``[off, off + count)`` of
    a timeline in any chunk decomposition yields identical floats, because
    the interpolation weight of global row ``t`` is computed from integer
    ``t mod hop`` (one f32 division of identical operands) rather than from
    a magnitude-dependent float ``t / hop``. This is what lets the serving
    pool ship mel FRAMES over the wire (hop x less host->device traffic
    than sample-rate rows) while keeping the batcher's bitwise
    solo-equality guarantee.

    ``frames``: ``(lanes, Fs, M)`` slab, where lane ``l``'s slab starts at
    its timeline frame ``off_l // hop`` and the host replicates the final
    frame past the timeline end. End-of-timeline semantics are defined at
    the FRAME level: rows past ``F * hop`` follow from replicated frames
    (the guard frames in :func:`frames_window_len` keep the conv stack's
    in-slab stage clamps from ever touching a returned row, so a
    full-timeline reference expansion must extend its frames by
    ``len(factors) + 1`` replicated rows the same way). ``phase``:
    ``(lanes,)`` int32 ``off_l mod hop``. ``factors``: the learnable
    upsampler stages (must match ``params['cond_up']``), or ``()`` for
    linear interpolation. Returns ``(lanes, count, M)`` f32.
    """
    j = phase[:, None] + jnp.arange(count, dtype=jnp.int32)[None]
    if factors:
        x = frames
        for i, r in enumerate(factors):
            w = params["cond_up"][f"s{i}"]  # (2, r, M, M)
            nxt = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
            a = jnp.einsum("lfm,jmn->lfjn", x, w[0])
            b = jnp.einsum("lfm,jmn->lfjn", nxt, w[1])
            y = a + b
            x = y.reshape(x.shape[0], x.shape[1] * r, x.shape[2])
        return jnp.take_along_axis(x, j[..., None], axis=1)
    Fs = frames.shape[1]
    i0 = jnp.minimum(j // hop_length, Fs - 1)
    w = (j % hop_length).astype(jnp.float32)[..., None] / hop_length
    a = jnp.take_along_axis(frames, i0[..., None], axis=1)
    b = jnp.take_along_axis(frames, jnp.minimum(i0 + 1, Fs - 1)[..., None],
                            axis=1)
    return a * (1.0 - w) + b * w


def linear_init_upsampler(
    factors: tuple[int, ...], channels: int, dtype=np.float32
) -> dict:
    """Upsampler weights that make :func:`upsample_frames_conv` reproduce
    linear interpolation: stage ``r`` mixes ``x[f]`` with weight ``1 - j/r``
    and ``x[f+1]`` with ``j/r`` through identity channel maps."""
    up = {}
    eye = np.eye(channels, dtype=dtype)
    for i, r in enumerate(factors):
        t = (np.arange(r, dtype=dtype) / r)[:, None, None]
        up[f"s{i}"] = np.stack([(1.0 - t) * eye, t * eye])  # (2, r, M, M)
    return up


def upsample_frames_np(frames: np.ndarray, hop_length: int, length: int) -> np.ndarray:
    """Host (numpy) twin of :func:`upsample_frames` — for the input
    pipeline, where a per-batch device dispatch (~26 ms through the axon
    tunnel) would dwarf the interpolation itself."""
    frames = np.asarray(frames, np.float32)
    lead = frames.shape[:-2]
    F, M = frames.shape[-2:]
    i0, i1, w = _upsample_weights(np, F, hop_length, length)
    # flat (*, F, M) + colon-indexing: both np.take(axis=-2) and
    # frames[..., i0, :] hit numpy's generic fancy-index path (~20-30x
    # slower); contiguous w keeps the blend vectorized
    flat = frames.reshape((-1, F, M))
    a = flat[:, i0, :]
    b = flat[:, i1, :]
    out = a + (b - a) * np.ascontiguousarray(w)
    return out.reshape(lead + (length, M))
