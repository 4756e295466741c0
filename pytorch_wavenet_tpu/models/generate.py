"""Autoregressive generation.

Two paths, mirroring the reference's capability surface:

* :func:`generate` — the naive O(receptive_field)-per-sample path
  (reference: wavenet_model.py:198-235). Kept as the correctness oracle for
  the fast path: same weights, same trunk, must agree.
* :func:`generate_fast` — Fast-WaveNet cached-queue generation
  (reference: wavenet_model.py:237-315, queues at wavenet_modules.py:42-77).

TPU-first redesign of the fast path:

* The reference keeps one Python ``DilatedQueue`` object per layer with
  host-side cursors and runs one tensor-op-per-layer per sample, then round
  trips to the host for numpy categorical sampling *every step*
  (reference: wavenet_model.py:282-289). Here the queues are exactly-sized
  device-resident ring buffers indexed by one global time cursor, the layer
  walk is statically unrolled (mirroring the training trunk), sampling is
  on-device inverse-CDF, and the whole sample loop is a ``lax.scan`` — zero
  host synchronization for the entire clip.
* Generation is batched over ``S`` independent streams (the reference is
  hard-coded to batch 1, wavenet_model.py:179); streams shard across chips
  on the 'data' mesh axis. For peak throughput see the fused Pallas kernels
  (ops/pallas/gen_kernel*.py); :func:`generate_long` chunks any backend to
  unbounded clip lengths.

Priming semantics match the reference: the given samples are pushed through
the queue path one step at a time and the last given sample is the first
generation input (reference: wavenet_model.py:253-269).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import WaveNetConfig
from ..ops.mulaw import mu_law_expansion_jnp
from .wavenet import Params, wavenet_logits, _mm


class GenState(NamedTuple):
    """Fast-generation state: one exactly-sized ring buffer per layer.

    Replaces the reference's per-layer ``DilatedQueue`` objects
    (reference: wavenet_model.py:78-81). ``buffers[l][s, p, :]`` holds the
    residual-stream activation of layer ``l``, stream ``s`` written at time
    ``t`` with ``p = t mod P_l`` where ``P_l = (k-1)*d_l + 1`` is the
    reference's per-queue max_length (wavenet_model.py:78); one global
    cursor replaces all the in_pos/out_pos pairs
    (reference: wavenet_modules.py:44-45,55-72). Total state is
    ~``2*receptive_field*R`` activations per stream — a uniform
    max-dilation-length buffer per layer would be ~L/2x larger and was
    measured to bottleneck the scan on whole-buffer copies at high stream
    counts.
    """

    buffers: tuple  # L arrays, (S, P_l, R) each
    t: jnp.ndarray  # scalar int32 global time cursor


class StreamState(NamedTuple):
    """Streaming handle for :func:`generate_fast`: the ring-buffer GenState
    plus the next input class per stream. Returned with ``return_state``;
    passing it back (``first_samples=None``) continues the rollout with no
    re-priming — bitwise identical to an uninterrupted run at temperature 0
    (the reference's persistent DilatedQueue capability,
    wavenet_model.py:78-81, as an explicit value)."""

    gen: GenState
    cls: jnp.ndarray  # (S,) int32 next input class


def buffer_length(cfg: WaveNetConfig, layer: int | None = None) -> int:
    """Ring length ``(kernel_size-1)*d + 1`` for ``layer`` (the largest
    layer's when ``layer`` is None; reference per-layer max_length at
    wavenet_model.py:78)."""
    d = cfg.max_dilation if layer is None else cfg.dilations[layer]
    return (cfg.kernel_size - 1) * d + 1


def init_gen_state(cfg: WaveNetConfig, num_streams: int = 1,
                   dtype=jnp.float32) -> GenState:
    """Zero-filled queues (reference: DilatedQueue.reset,
    wavenet_modules.py:74-77)."""
    bufs = tuple(
        jnp.zeros((num_streams, buffer_length(cfg, l), cfg.residual_channels),
                  dtype)
        for l in range(cfg.num_layers)
    )
    return GenState(buffers=bufs, t=jnp.zeros((), jnp.int32))


def gen_step(
    params: Params,
    cfg: WaveNetConfig,
    state: GenState,
    cur_class: jnp.ndarray,
    cond: jnp.ndarray | None = None,
    global_cond: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, GenState]:
    """One autoregressive step for all streams.

    ``cur_class``: int32 ``(S,)`` current sample class. ``cond``: optional
    local conditioning ``(S, cond_channels)`` for this step. Returns logits
    ``(S, classes)`` and the updated state. Equivalent to one pass of the
    reference trunk under ``queue_dilate`` (reference: wavenet_model.py:177-184).
    The layer loop is statically unrolled like the training trunk, with the
    same tap accumulation order, so argmax rollouts agree bitwise.
    """
    k = cfg.kernel_size
    cdt = cfg.compute_dtype
    t = state.t

    h = jnp.take(params["start"]["w"], cur_class, axis=0)  # (S, R)
    if "b" in params["start"]:
        h = h + params["start"]["b"]
    h = h.astype(jnp.float32)

    S = h.shape[0]
    skip = jnp.zeros((S, cfg.skip_channels), jnp.float32)
    lp = params["layers"]
    new_buffers = []

    for l, d in enumerate(cfg.dilations):
        buf = state.buffers[l]  # (S, P_l, R)
        P = buf.shape[1]
        slot = t % P
        # ring write of the current activation (reference enqueue,
        # wavenet_modules.py:55-57)
        new_buffers.append(
            lax.dynamic_update_slice_in_dim(
                buf, h.astype(buf.dtype)[:, None, :], slot, axis=1
            )
        )
        # gated conv over the k taps (reference dequeue + conv,
        # wavenet_modules.py:59-72 + wavenet_model.py:147-151)
        z = _mm(h, lp["w_in"][l, k - 1], cdt)
        for j in range(k - 1):
            idx = (t - (k - 1 - j) * d) % P
            tap = lax.dynamic_index_in_dim(buf, idx, axis=1, keepdims=False)
            z = z + _mm(tap.astype(jnp.float32), lp["w_in"][l, j], cdt)
        if cond is not None:
            z = z + _mm(cond, lp["w_cond"][l], cdt)
        if global_cond is not None:
            z = z + _mm(global_cond, lp["w_gcond"][l], cdt)
        if "b_in" in lp:
            z = z + lp["b_in"][l]
        f, g = jnp.split(z, 2, axis=-1)
        u = jnp.tanh(f) * jax.nn.sigmoid(g)

        s = _mm(u, lp["w_skip"][l], cdt)
        if "b_skip" in lp:
            s = s + lp["b_skip"][l]
        skip = skip + s

        r = _mm(u, lp["w_res"][l], cdt)
        if "b_res" in lp:
            r = r + lp["b_res"][l]
        h = r + h

    y = jax.nn.relu(skip)
    y = jax.nn.relu(_mm(y, params["end1"]["w"], cdt) + params["end1"]["b"])
    logits = _mm(y, params["end2"]["w"], cdt) + params["end2"]["b"]
    return logits, GenState(buffers=tuple(new_buffers), t=t + 1)


class PendingWindow(NamedTuple):
    """Uncommitted ring writes from :func:`gen_step_window`: the per-layer
    residual-stream activations of the window's positions. Splitting
    compute from commit lets speculative decoding decide how many window
    positions were real *after* seeing the logits, then commit exactly
    that many (models/speculative.py)."""

    h_wins: tuple  # L arrays, (S, k, R) each
    t: jnp.ndarray  # window start time (the state's cursor at compute time)


def gen_step_window(
    params: Params,
    cfg: WaveNetConfig,
    state: GenState,
    window: jnp.ndarray,
    cond: jnp.ndarray | None = None,
    global_cond: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, PendingWindow]:
    """``k`` autoregressive steps in ONE trunk pass over cached ring state.

    ``window``: int32 ``(S, k)`` input classes for times ``t .. t+k-1``.
    Returns logits ``(S, k, classes)`` — row ``i`` predicts the sample at
    time ``t+i+1`` — and a :class:`PendingWindow`; apply
    :func:`commit_window` to advance the state by however many of the
    ``k`` positions turn out to be real.

    Why this exists: a sequential rollout pays the full serial layer chain
    *per sample*; here each layer is one ``(S*k, R)`` matmul, so on the MXU
    ``k`` steps cost nearly the same wall clock as one (wider sublanes,
    identical dot count). That makes it the teacher-side verifier for
    speculative decoding, and a fast bulk-priming path. Equivalent to
    ``k`` chained :func:`gen_step` calls: per position, taps with lookback
    ``m`` land in-window (register-carried, ``i - m >= 0``) or in the ring
    (times ``< t``, untouched until commit); tap accumulation order matches
    gen_step, so rollouts agree.
    """
    k = cfg.kernel_size
    cdt = cfg.compute_dtype
    t = state.t
    S, win = window.shape

    h = jnp.take(params["start"]["w"], window, axis=0)  # (S, k, R)
    if "b" in params["start"]:
        h = h + params["start"]["b"]
    h = h.astype(jnp.float32)

    skip = jnp.zeros((S, win, cfg.skip_channels), jnp.float32)
    lp = params["layers"]
    h_wins = []

    for l, d in enumerate(cfg.dilations):
        buf = state.buffers[l]  # (S, P_l, R)
        P = buf.shape[1]
        h_wins.append(h)
        z = _mm(h, lp["w_in"][l, k - 1], cdt)
        for j in range(k - 1):
            m = (k - 1 - j) * d  # this tap's lookback; m < P
            # positions i < m read the ring (times t+i-m < t, pre-window);
            # positions i >= m read the window's own activations
            n_ring = min(m, win)
            ring_taps = [
                lax.dynamic_index_in_dim(buf, (t + i - m) % P, axis=1)
                for i in range(n_ring)
            ]
            parts = ring_taps + (
                [h[:, : win - m, :]] if m < win else []
            )
            tap = jnp.concatenate(parts, axis=1).astype(jnp.float32)
            z = z + _mm(tap, lp["w_in"][l, j], cdt)
        if cond is not None:
            z = z + _mm(cond, lp["w_cond"][l], cdt)
        if global_cond is not None:
            z = z + _mm(global_cond, lp["w_gcond"][l], cdt)[:, None, :]
        if "b_in" in lp:
            z = z + lp["b_in"][l]
        f, g = jnp.split(z, 2, axis=-1)
        u = jnp.tanh(f) * jax.nn.sigmoid(g)

        s = _mm(u, lp["w_skip"][l], cdt)
        if "b_skip" in lp:
            s = s + lp["b_skip"][l]
        skip = skip + s

        r = _mm(u, lp["w_res"][l], cdt)
        if "b_res" in lp:
            r = r + lp["b_res"][l]
        h = r + h

    y = jax.nn.relu(skip)
    y = jax.nn.relu(_mm(y, params["end1"]["w"], cdt) + params["end1"]["b"])
    logits = _mm(y, params["end2"]["w"], cdt) + params["end2"]["b"]
    return logits, PendingWindow(h_wins=tuple(h_wins), t=t)


def commit_window(
    state: GenState, pending: PendingWindow, valid
) -> GenState:
    """Advance ``state`` by the first ``valid`` positions of a computed
    window (``valid`` may be traced, ``0 <= valid <= k``): ring slots for
    positions ``i < valid`` take the pending activations, the cursor moves
    by ``valid``. Ascending-order predicated writes make the last write to
    an aliased slot win — the same final ring content ``valid`` sequential
    :func:`gen_step` calls would leave."""
    t = pending.t
    new_buffers = []
    for l, (buf, h_win) in enumerate(zip(state.buffers, pending.h_wins)):
        P = buf.shape[1]
        win = h_win.shape[1]
        for i in range(win):
            slot = (t + i) % P
            wrote = lax.dynamic_update_slice_in_dim(
                buf, h_win[:, i : i + 1].astype(buf.dtype), slot, axis=1
            )
            buf = jnp.where(i < valid, wrote, buf)
        new_buffers.append(buf)
    return GenState(buffers=tuple(new_buffers), t=t + valid)


def _sample(logits, u, classes, temperature, regularize):
    """Temperature sampling with the reference's optional quadratic
    regularizer pulling toward the mid class (reference:
    wavenet_model.py:273-274,280-294). temperature==0 -> argmax.

    Sampling is inverse-CDF over the tempered softmax — the same transform
    ``np.random.choice(p=softmax(x/T))`` applies on the host in the reference
    (wavenet_model.py:282-289), but driven by one on-device uniform per
    (step, stream). The uniforms are drawn *outside* the sample scan (one
    vectorized call) so no RNG primitive lives inside the compiled loop —
    keeps compile fast and the noise footprint at O(steps*streams), not
    O(steps*streams*classes) as per-class Gumbel noise would need.

    ``temperature`` may also be a per-stream ``(S,)`` array (traced):
    streams at different temperatures share one rollout — streams with
    temperature <= 0 take the argmax branch, identical to a scalar
    temperature-0 rollout of that stream.
    """
    if regularize != 0.0:
        reg = (jnp.arange(classes, dtype=jnp.float32) - classes / 2.0) ** 2
        logits = logits - reg * regularize
    greedy = jnp.argmax(logits, axis=-1)
    if isinstance(temperature, (int, float)):
        if temperature <= 0:
            return greedy
        probs = jax.nn.softmax(logits / temperature, axis=-1)
    else:
        t = jnp.maximum(temperature, 1e-6)[..., None]
        probs = jax.nn.softmax(logits / t, axis=-1)
    cdf = jnp.cumsum(probs, axis=-1)
    idx = jnp.sum(u[..., None] > cdf, axis=-1)
    drawn = jnp.minimum(idx, classes - 1)
    if isinstance(temperature, (int, float)):
        return drawn
    return jnp.where(temperature > 0, drawn, greedy)


@partial(
    jax.jit,
    static_argnames=("cfg", "num_samples", "temperature", "regularize",
                     "return_state"),
)
def _generate_fast_jit(
    params: Params,
    cfg: WaveNetConfig,
    key: jax.Array,
    num_samples: int,
    first_samples: jnp.ndarray | None = None,
    temperature: float = 1.0,
    regularize: float = 0.0,
    cond: jnp.ndarray | None = None,
    global_cond: jnp.ndarray | None = None,
    state: StreamState | None = None,
    return_state: bool = False,
    lane_temp: jnp.ndarray | None = None,
):
    """Fast-WaveNet generation (reference: wavenet_model.py:237-315).

    ``first_samples``: int32 ``(S, num_given)`` prime samples per stream (or
    ``(num_given,)`` for a single stream). Defaults to one mid-class sample
    (reference: wavenet_model.py:245-247).
    ``cond``: optional local conditioning ``(S, total, cond_channels)`` where
    ``total = num_given - 1 + num_samples``; row t conditions the step that
    consumes input sample t (vocoder mode; requires cfg.cond_channels > 0).
    ``state``/``return_state``: streaming — see :class:`StreamState`.

    Returns ``(waveform (S, num_samples) float32, classes (S, num_samples)
    int32)`` (plus the new StreamState when requested), waveform mu-law
    expanded like the reference (wavenet_model.py:296,314).
    """
    resume = state is not None
    if resume:
        if first_samples is not None:
            raise ValueError("pass either first_samples or state, not both")
        S = state.cls.shape[0]
        first_samples = state.cls.reshape(S, 1).astype(jnp.int32)
        num_given = 1
    else:
        if first_samples is None:
            first_samples = jnp.full((1, 1), cfg.classes // 2, jnp.int32)
        first_samples = jnp.atleast_2d(first_samples).astype(jnp.int32)
        S, num_given = first_samples.shape
    total = num_given - 1 + num_samples

    gstate = state.gen if resume else init_gen_state(cfg, S)
    # one uniform per (step, stream), drawn outside the scan (see _sample)
    uniforms = jax.random.uniform(key, (total, S), jnp.float32)
    # input class for priming step i is first_samples[:, i]; pad so the
    # gather below stays in bounds once i+1 >= num_given.
    given = jnp.pad(first_samples, ((0, 0), (0, max(0, total + 1 - num_given))))
    cond_t = None if cond is None else jnp.swapaxes(cond, 0, 1)  # (total,S,M)

    temp = temperature if lane_temp is None else lane_temp

    def step(carry, xs):
        gstate, cur = carry
        u, i, c = xs
        logits, gstate = gen_step(params, cfg, gstate, cur, cond=c,
                                  global_cond=global_cond)
        sampled = _sample(logits, u, cfg.classes, temp, regularize)
        nxt = jnp.where(i + 1 < num_given, given[:, jnp.minimum(i + 1, total)], sampled)
        return (gstate, nxt.astype(jnp.int32)), sampled

    (final_gstate, final_cls), samples = lax.scan(
        step,
        (gstate, first_samples[:, 0]),
        (uniforms, jnp.arange(total, dtype=jnp.int32), cond_t),
    )
    out = samples[num_given - 1 :].T  # (S, num_samples)
    wav = mu_law_expansion_jnp((out.astype(jnp.float32) / cfg.classes) * 2.0 - 1.0,
                               cfg.classes)
    if not return_state:
        return wav, out
    return wav, out, StreamState(gen=final_gstate, cls=final_cls)


def generate_fast(
    params: Params,
    cfg: WaveNetConfig,
    key: jax.Array,
    num_samples: int,
    first_samples: jnp.ndarray | None = None,
    temperature: float = 1.0,
    regularize: float = 0.0,
    cond: jnp.ndarray | None = None,
    global_cond: jnp.ndarray | None = None,
    state: StreamState | None = None,
    return_state: bool = False,
    progress_callback=None,
    progress_interval: int = 1000,
    window_prime: bool = False,
):
    """Public fast-generation entry (see :func:`_generate_fast_jit` for the
    full contract). ``progress_callback(done, total)`` fires every
    ``progress_interval`` samples (reference: wavenet_model.py:242-243,
    308-311) — the rollout is split into streaming-state chunks at that
    cadence, which is bitwise-free (see :class:`StreamState`).

    ``window_prime`` ingests the prime through multi-position window
    passes (:func:`gen_step_window`, 128 steps per trunk pass) instead of
    one scan step each — ~2 orders of magnitude less serial latency on a
    receptive-field-long prime. The rollout is the same computation with
    reassociated float reductions and a freshly keyed noise stream, so
    sampled outputs are statistically (not bitwise) identical; argmax
    rollouts agree except on near-tie logits.

    ``temperature`` may be a per-stream ``(S,)`` array: streams at
    different sampling temperatures share one rollout (a temp<=0 stream
    is bitwise the scalar temperature-0 rollout — see :func:`_sample`)."""
    lane_temp = None
    if not isinstance(temperature, (int, float)):
        lane_temp = jnp.asarray(temperature, jnp.float32)
        temperature = 0.0
    if window_prime and state is None and first_samples is not None:
        first_samples = jnp.atleast_2d(first_samples).astype(jnp.int32)
        S, num_given = first_samples.shape
        if num_given > 1:
            gstate = init_gen_state(cfg, S)
            given = first_samples[:, :-1]
            pos, CH = 0, 128
            while pos < num_given - 1:
                c = min(CH, num_given - 1 - pos)
                cw = None if cond is None else cond[:, pos:pos + c]
                _, pend = gen_step_window(
                    params, cfg, gstate, given[:, pos:pos + c], cond=cw,
                    global_cond=global_cond,
                )
                gstate = commit_window(gstate, pend, c)
                pos += c
            state = StreamState(gen=gstate, cls=first_samples[:, -1])
            first_samples = None
            cond = None if cond is None else cond[:, num_given - 1:]
    if progress_callback is None or num_samples <= progress_interval:
        out = _generate_fast_jit(
            params, cfg, key, num_samples, first_samples,
            temperature=temperature, regularize=regularize, cond=cond,
            global_cond=global_cond, state=state, return_state=return_state,
            lane_temp=lane_temp,
        )
        if progress_callback is not None:
            progress_callback(num_samples, num_samples)
        return out
    wavs, clss = [], []
    done = 0
    cond_pos = 0  # consumed rows of the (S, total, M) conditioning timeline
    while done < num_samples:
        n = min(progress_interval, num_samples - done)
        key, sub = jax.random.split(key)
        if cond is None:
            cw = None
        else:
            # chunk's timeline length = num_given - 1 + n; only the first
            # chunk can carry a multi-sample prime, resumed chunks always
            # re-enter with num_given == 1 (state.cls)
            if done == 0 and state is None:
                ng = (1 if first_samples is None
                      else jnp.atleast_2d(first_samples).shape[1])
            else:
                ng = 1
            clen = ng - 1 + n
            cw = cond[:, cond_pos : cond_pos + clen]
            cond_pos += clen
        wav, cls, state = _generate_fast_jit(
            params, cfg, sub, n, first_samples if done == 0 else None,
            temperature=temperature, regularize=regularize, cond=cw,
            global_cond=global_cond, state=state, return_state=True,
            lane_temp=lane_temp,
        )
        wavs.append(wav)
        clss.append(cls)
        done += n
        progress_callback(done, num_samples)
    wav = jnp.concatenate(wavs, axis=1)
    cls = jnp.concatenate(clss, axis=1)
    if return_state:
        return wav, cls, state
    return wav, cls


@partial(
    jax.jit,
    static_argnames=("cfg", "num_samples", "temperature", "regularize"),
)
def generate(
    params: Params,
    cfg: WaveNetConfig,
    key: jax.Array,
    num_samples: int,
    first_samples: jnp.ndarray | None = None,
    temperature: float = 1.0,
    regularize: float = 0.0,
    cond: jnp.ndarray | None = None,
    global_cond: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Naive autoregressive generation: re-run the full receptive-field
    window per sample (reference: wavenet_model.py:198-235). O(rf) per step —
    the correctness oracle for :func:`generate_fast`, including for the
    conditioned (vocoder) path: ``cond`` uses the same ``(S, total, M)``
    timeline convention.

    Short primes are left-padded with class 0 (the reference zero-pads the
    prime window, wavenet_model.py:203-210).
    """
    rf = cfg.receptive_field
    if first_samples is None:
        first_samples = jnp.zeros((1, 1), jnp.int32)
    first_samples = jnp.atleast_2d(first_samples).astype(jnp.int32)
    S, num_given = first_samples.shape

    window = jnp.zeros((S, rf), jnp.int32)
    ng = min(num_given, rf)
    window = lax.dynamic_update_slice(window, first_samples[:, -ng:], (0, rf - ng))

    uniforms = jax.random.uniform(key, (num_samples, S), jnp.float32)
    if cond is not None:
        # cond_pad[k] = cond[k - rf] (zero before the timeline starts);
        # step i's window covers sample indices [num_given+i-rf,
        # num_given+i), i.e. cond_pad rows [num_given+i, num_given+i+rf)
        cond_pad = jnp.pad(cond, ((0, 0), (rf, 0), (0, 0)))

    def step(window, xs):
        u, i = xs
        if cond is None:
            cw = None
        else:
            cw = lax.dynamic_slice(
                cond_pad, (0, num_given + i, 0), (S, rf, cond_pad.shape[2])
            )
        logits = wavenet_logits(params, cfg, window, out_len=1, cond=cw,
                                global_cond=global_cond)[:, 0, :]
        sampled = _sample(logits, u, cfg.classes, temperature, regularize)
        window = jnp.concatenate([window[:, 1:], sampled[:, None]], axis=1)
        return window, sampled

    _, samples = lax.scan(
        step, window, (uniforms, jnp.arange(num_samples, dtype=jnp.int32))
    )
    out = samples.T  # (S, num_samples)
    wav = mu_law_expansion_jnp((out.astype(jnp.float32) / cfg.classes) * 2.0 - 1.0,
                               cfg.classes)
    return wav, out


def synthesize(
    params: Params,
    cfg: WaveNetConfig,
    key: jax.Array,
    mel: jnp.ndarray,
    hop_length: int,
    first_samples: jnp.ndarray | None = None,
    temperature: float = 1.0,
    regularize: float = 0.0,
    global_cond: jnp.ndarray | None = None,
    num_samples: int | None = None,
    backend=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mel frames -> audio: the vocoder serving entry point.

    ``mel`` is ``(S, F, cond_channels)`` (or ``(F, cond_channels)`` for one
    stream) of log-mel frames at ``hop_length``-sample resolution — the
    output of :func:`ops.mel.log_mel_spectrogram` or any acoustic model
    emitting the same features. The frames are upsampled to per-sample
    conditioning rows through :func:`models.wavenet.upsample_cond` (the
    learnable transposed-conv stack when ``cfg.cond_upsample`` enables one,
    else linear interpolation) and drive a conditioned autoregressive
    rollout. Capability target: BASELINE config 5's mel-conditioned
    vocoder; the unconditional reference has no analogue (its closest
    surface is generate_fast, wavenet_model.py:237).

    ``num_samples`` defaults to ``F * hop_length - num_given + 1`` so the
    rollout consumes exactly the conditioned timeline. ``backend`` is any
    generator with :func:`generate_fast`'s signature (e.g. the fused
    ``ops.pallas.gen_kernel_hbm.generate_fast_batched`` for many streams) —
    all take the same ``cond=(S, total, M)`` contract.

    Returns ``(waveform (S, num_samples) float32, classes int32)``.
    """
    if backend is None:
        backend = generate_fast
    if mel.ndim == 2:
        mel = mel[None]
    S, F, M = mel.shape
    if cfg.cond_channels != M:
        raise ValueError(
            f"mel has {M} channels but cfg.cond_channels is {cfg.cond_channels}"
        )
    if first_samples is None:
        first_samples = jnp.full((S, 1), cfg.classes // 2, jnp.int32)
    first_samples = jnp.atleast_2d(first_samples).astype(jnp.int32)
    if first_samples.shape[0] == 1 and S > 1:
        first_samples = jnp.broadcast_to(
            first_samples, (S, first_samples.shape[1])
        )
    num_given = first_samples.shape[1]
    if num_samples is None:
        num_samples = F * hop_length - num_given + 1
    total = num_given - 1 + num_samples
    from .wavenet import upsample_cond

    cond = upsample_cond(params, cfg, mel, hop_length, total)
    return backend(
        params, cfg, key, num_samples, first_samples,
        temperature=temperature, regularize=regularize, cond=cond,
        global_cond=global_cond,
    )


def generate_long(
    params: Params,
    cfg: WaveNetConfig,
    key: jax.Array,
    num_samples: int,
    first_samples: jnp.ndarray | None = None,
    temperature: float = 1.0,
    regularize: float = 0.0,
    chunk_size: int = 65536,
    backend=None,
    progress_callback=None,
    streaming: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Arbitrary-length generation by chunking any backend.

    Runs ``backend`` (default :func:`generate_fast`; pass
    ``ops.pallas.gen_kernel.generate_fast_fused`` or the HBM kernel on TPU)
    in ``chunk_size`` pieces. With ``streaming`` (default), the backend's
    ring-buffer state flows between chunks (``state``/``return_state``), so
    chunk boundaries are free and the whole rollout is bitwise identical to
    a single shot at temperature 0. ``streaming=False`` falls back to
    re-priming each chunk with the previous chunk's last receptive-field
    samples (~rf/chunk_size overhead) for backends without state support.
    Keeps the fused kernels' on-chip output buffers bounded for clips of
    any length and gives the reference's ``progress_callback`` hook a
    natural cadence (reference: wavenet_model.py:242-243,308-311).
    """
    if backend is None:
        backend = generate_fast
    rf = cfg.receptive_field
    if chunk_size <= rf:
        raise ValueError(f"chunk_size {chunk_size} must exceed rf {rf}")
    if first_samples is None:
        first_samples = jnp.full((1, 1), cfg.classes // 2, jnp.int32)
    prime = jnp.atleast_2d(first_samples).astype(jnp.int32)

    outs = []
    done = 0
    state = None
    while done < num_samples:
        n = min(chunk_size, num_samples - done)
        key, sub = jax.random.split(key)
        if streaming:
            _, cls, state = backend(
                params, cfg, sub, n, prime if state is None else None,
                temperature=temperature, regularize=regularize,
                state=state, return_state=True,
            )
        else:
            _, cls = backend(
                params, cfg, sub, n, prime,
                temperature=temperature, regularize=regularize,
            )
            # next chunk continues from the full history tail
            hist = jnp.concatenate([prime, cls], axis=1)
            prime = hist[:, -rf:]
        outs.append(cls)
        done += n
        if progress_callback is not None:
            progress_callback(done, num_samples)

    out = jnp.concatenate(outs, axis=1)
    wav = mu_law_expansion_jnp(
        (out.astype(jnp.float32) / cfg.classes) * 2.0 - 1.0, cfg.classes
    )
    return wav, out
