"""Conditioned-distillation level regression (VERDICT r3 #3).

The vocoder demo measured the scalar RMS regulator holding only the batch
MARGINAL level while the conditioned student ran 25% hot on held-out mels.
The fix (training/distill.py ``rms_per_item``) pins each draw's level to
its own conditioning window's level, teaching the mel->gain mapping.

Miniature of scripts/distill_demo.py --mode vocoder on an
amplitude-MODULATED melody (loud and quiet segments): after distillation
with the per-item regulator the student must (a) track per-window level
better than its init and (b) keep the overall draw level inside the same
absolute whisper/explosion band the unconditioned test uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import pytorch_wavenet_tpu as wt
from pytorch_wavenet_tpu.models.iaf import (
    IAFConfig,
    init_student,
    student_generate,
)
from pytorch_wavenet_tpu.ops import mel as mel_ops
from pytorch_wavenet_tpu.ops.mulaw import quantize_data
from pytorch_wavenet_tpu.training.distill import distill_step
from pytorch_wavenet_tpu.training.trainer import train_step

SR = 16000
N_MELS, N_FFT, HOP = 8, 256, 64


def _am_melody(seconds=3.0, seed=0):
    """High-register melody with alternating loud/quiet half-second
    segments — the level is a function of (observable) signal energy, so
    the mel conditioning carries it."""
    rng = np.random.default_rng(seed)
    scale = 1200.0 * 2.0 ** (np.array([0, 2, 4, 7, 9]) / 12.0)
    note = SR // 8
    n = int(seconds * SR)
    idx = np.cumsum(rng.integers(-2, 3, n // note + 1)) % len(scale)
    f0 = np.repeat(scale[idx], note)[:n]
    phase = 2 * np.pi * np.cumsum(f0) / SR
    wav = 0.5 * np.sin(phase) + 0.2 * np.sin(2 * phase)
    seg = SR // 2
    env = np.repeat(
        np.where(np.arange(n // seg + 1) % 2 == 0, 1.0, 0.3), seg)[:n]
    return (wav * env).astype(np.float32)


def _cond_timeline(wav):
    frames = mel_ops.log_mel_spectrogram(
        wav, num_mels=N_MELS, n_fft=N_FFT, hop_length=HOP,
        sampling_rate=SR)
    return np.asarray(
        mel_ops.upsample_frames_np(frames[None], HOP, len(wav)))[0]


@pytest.fixture(scope="module")
def cond_distilled():
    wav = _am_melody()
    cond_full = _cond_timeline(wav)
    tcfg = wt.get_config("tiny", output_length=64, cond_channels=N_MELS)
    q = quantize_data(wav, tcfg.classes).astype(np.int32)

    params = wt.init_wavenet(jax.random.PRNGKey(0), tcfg)
    tx = wt.reference_adam(2e-3)
    opt = tx.init(params)
    rng = np.random.default_rng(1)
    item, out = tcfg.item_length, tcfg.output_length
    first = last = None
    for step in range(250):
        s = rng.integers(0, len(q) - item - 1, 4)
        x = jnp.asarray(np.stack([q[i : i + item] for i in s]))
        y = jnp.asarray(
            np.stack([q[i + item - out + 1 : i + item + 1] for i in s]))
        c = jnp.asarray(np.stack([cond_full[i : i + item] for i in s]))
        params, opt, loss, _ = train_step(params, opt, tcfg, tx, x, y,
                                          cond=c)
        if first is None:
            first = float(loss)
        last = float(loss)
    assert last < first

    scfg = IAFConfig(flows=2, layers=4, blocks=1, residual_channels=16,
                     dilation_channels=16, skip_channels=16,
                     end_channels=16, cond_channels=N_MELS)
    data_rms = float(np.sqrt(np.mean(wav**2)))
    student0 = init_student(jax.random.PRNGKey(2), scfg,
                            init_scale=data_rms / 1.8138)
    stx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    sopt = stx.init(student0)
    dlen = tcfg.receptive_field + 257
    student = jax.tree.map(jnp.copy, student0)
    for step in range(250):
        s = rng.integers(0, len(wav) - dlen - 1, 4)
        c = jnp.asarray(np.stack([cond_full[i : i + dlen] for i in s]))
        ref = jnp.asarray(np.stack([wav[i : i + dlen] for i in s]))
        student, sopt, _, aux = distill_step(
            student, sopt, params, scfg, tcfg, stx,
            jax.random.fold_in(jax.random.PRNGKey(3), step), 4, dlen,
            cond=c, audio_ref=ref, power_weight=0.03, rms_weight=3.0,
            teacher_smooth=1e-3, rms_per_item=True)
    return wav, cond_full, scfg, student0, student


def _window_draws(wav, cond_full, scfg, student, n_win=6, wlen=4096,
                  seed=11):
    """Generate one draw per evaluation window, conditioned on that
    window's mels; returns (draw rms per window, data rms per window)."""
    rng = np.random.default_rng(seed)
    starts = rng.integers(0, len(wav) - wlen - 1, n_win)
    cond = jnp.asarray(np.stack([cond_full[s : s + wlen] for s in starts]))
    draws = np.asarray(student_generate(
        student, scfg, jax.random.PRNGKey(seed), wlen,
        num_streams=n_win, cond=cond))
    dr = np.sqrt(np.mean(draws**2, axis=-1))
    rr = np.asarray([np.sqrt(np.mean(wav[s : s + wlen] ** 2))
                     for s in starts])
    return dr, rr


def test_per_item_level_beats_init(cond_distilled):
    """Per-window log-level error shrinks vs the init student: the
    conditioned student learned level-from-mels, not just the marginal."""
    wav, cond_full, scfg, student0, student = cond_distilled
    d0, r = _window_draws(wav, cond_full, scfg, student0)
    d1, _ = _window_draws(wav, cond_full, scfg, student)
    err0 = float(np.mean((np.log(d0 + 1e-6) - np.log(r + 1e-6)) ** 2))
    err1 = float(np.mean((np.log(d1 + 1e-6) - np.log(r + 1e-6)) ** 2))
    assert err1 < err0, (err0, err1)


def test_cond_whisper_band(cond_distilled):
    """The conditioned whisper check: overall draw energy within the same
    absolute band the unconditioned regression uses — no whisper collapse,
    no hot student (the 1.25x failure this round fixed)."""
    wav, cond_full, scfg, _, student = cond_distilled
    d1, r = _window_draws(wav, cond_full, scfg, student)
    ratio = float(np.sqrt(np.mean(d1**2)) / np.sqrt(np.mean(r**2)))
    assert abs(np.log(ratio)) < np.log(1.6), ratio
