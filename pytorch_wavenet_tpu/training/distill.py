"""Probability density distillation: AR teacher -> parallel IAF student.

Trains models/iaf.py's student to match the teacher WaveNet
(van den Oord et al. 2018, "Parallel WaveNet"; beyond the reference's
scope — docs/ROADMAP.md "capability" item). The generalized objective is

    KL( q_student || p_teacher )  =  E_{x~q} [ log q(x) - log p(x) ]

estimated pathwise: the student draws x via reparameterized noise
(models/iaf.py student_sample), the teacher scores x teacher-forced in one
parallel trunk pass — both terms are dense TPU work with no sampling loop.

The teacher here is *categorical* over mu-law classes (reference:
wavenet_model.py:167-170), not the paper's mixture-of-logistics, so the KL
is taken per step between two distributions over the C classes:

* the student's per-step output conditional is Logistic(m_t, s_t) in
  amplitude space (closed form through the affine flows); integrating its
  density over each mu-law quantization bin gives an exact discrete
  distribution q_t(c) — differentiable in (m_t, s_t) via the logistic CDF;
* the teacher's p_t(c) is softmax of its logits at the same position.

    L_KL = mean_t KL( q_t(bins) || p_t )

Gradients flow through q_t analytically; the teacher is stop-gradiented
and its integer-quantized input breaks the (intentionally ignored)
history-dependence term, as in the paper's estimator. An optional *power
loss* matches average log-power spectra between student draws and real
audio — the paper's fix for the whisper-mode collapse of pure KL.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import WaveNetConfig
from ..models.iaf import IAFConfig, StudentParams, student_sample
from ..models.wavenet import wavenet_logits
from ..ops.mulaw import mu_law_expansion, quantize_data_jnp


def mu_law_bin_edges(classes: int) -> np.ndarray:
    """Amplitude-space edges of the ``classes`` quantization bins,
    ``(classes + 1,)`` with infinite outer edges (mass outside [-1, 1]
    belongs to the boundary classes, matching the pre-encode clip).

    Bin c spans ``[edges[c], edges[c+1])`` — the expansion of the encoder's
    mu-law-space edges ``linspace(-1, 1, classes)``
    (ops/mulaw.py quantize_data; reference: audio_data.py:133-137)."""
    inner = mu_law_expansion(np.linspace(-1.0, 1.0, classes), classes)
    return np.concatenate([[-np.inf], inner[1:], [np.inf]]).astype(np.float32)


def student_bin_logprobs(
    m: jnp.ndarray, log_s: jnp.ndarray, classes: int
) -> jnp.ndarray:
    """Discretize per-step Logistic(m, exp(log_s)) over the mu-law bins.

    Returns probabilities ``(..., classes)`` summing to 1: the logistic CDF
    is a sigmoid, so each bin mass is a difference of sigmoids — exact and
    smooth in (m, log_s). Only the finite inner edges enter the
    computation (the boundary bins are CDF complements): pushing the
    infinite outer edges through the scale chain would make their gradient
    w.r.t. ``log_s`` an ``0 * inf`` NaN."""
    edges = jnp.asarray(mu_law_bin_edges(classes)[1:-1])  # (C-1,) finite
    zed = (edges - m[..., None]) * jnp.exp(-log_s)[..., None]
    cdf = jax.nn.sigmoid(zed)
    return jnp.concatenate(
        [cdf[..., :1], jnp.diff(cdf, axis=-1), 1.0 - cdf[..., -1:]],
        axis=-1,
    )


def power_spectrum(
    x: jnp.ndarray, frame: int = 256, hop: int = 64
) -> jnp.ndarray:
    """Batch-and-frame-averaged log power spectrum ``(frame//2 + 1,)``."""
    T = x.shape[-1]
    n = (T - frame) // hop + 1
    idx = np.arange(n)[:, None] * hop + np.arange(frame)
    frames = x[:, idx] * jnp.hanning(frame)
    mag2 = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2
    return jnp.log(jnp.mean(mag2, axis=(0, 1)) + 1e-8)


def distill_loss(
    student_params: StudentParams,
    teacher_params: Any,
    scfg: IAFConfig,
    tcfg: WaveNetConfig,
    key: jax.Array,
    batch_size: int,
    length: int,
    cond: jnp.ndarray | None = None,
    global_cond: jnp.ndarray | None = None,
    audio_ref: jnp.ndarray | None = None,
    power_weight: float = 0.0,
    rms_weight: float = 0.0,
    teacher_smooth: float = 0.0,
    rms_per_item: bool = False,
) -> tuple[jnp.ndarray, dict]:
    """One-draw estimate of the distillation objective.

    ``length`` must exceed the teacher's receptive field; the first ``rf``
    positions only prime the teacher. ``audio_ref`` ``(B', T')`` enables
    the power loss. Returns ``(loss, aux)`` with aux carrying the KL and
    power terms.

    ``teacher_smooth``: label-smooth the teacher's conditional,
    ``p' = (1-eps) p + eps/C``. A SHARP categorical teacher (per-position
    CE well under 1 nat) makes distillation collapse at scale: where the
    student's loc is off, every nearby bin has -log p in the tens of
    nats, so the KL's cheapest descent direction is widening log_s toward
    uniform — measured as a runaway to the +/-7 log-scale bound and a
    student-independent KL plateau (KL(uniform || teacher), dead
    gradients). Smoothing floors -log p' at ~log(C/eps), restoring a
    usable loc gradient; 1e-3 worked at chaconne scale."""
    rf = tcfg.receptive_field
    if length <= rf:
        raise ValueError(f"length {length} must exceed teacher rf {rf}")
    draw = student_sample(student_params, scfg, key, (batch_size, length),
                          cond=cond, global_cond=global_cond)
    x = jnp.clip(draw.x, -1.0, 1.0)

    # teacher scores the draw teacher-forced on its own mu-law codebook;
    # logits[:, i] predicts position rf + i (data/dataset.py window
    # convention) — the last one falls beyond the clip and is dropped
    xq = quantize_data_jnp(jax.lax.stop_gradient(x), tcfg.classes)
    # the teacher scores under the SAME conditioning timeline the student
    # drew with (vocoder distillation: both see the mel rows; each applies
    # its own alignment convention internally)
    t_logits = wavenet_logits(
        jax.lax.stop_gradient(teacher_params), tcfg, xq,
        out_len=length - rf + 1,
        cond=None if cond is None or tcfg.cond_channels == 0 else cond,
        global_cond=None if global_cond is None or tcfg.gcond_channels == 0
        else global_cond,
    )[:, :-1]
    logp = jax.nn.log_softmax(t_logits, axis=-1)  # (B, length-rf, C)
    if teacher_smooth:
        C = tcfg.classes
        logp = jnp.logaddexp(
            logp + jnp.log1p(-teacher_smooth),
            jnp.log(teacher_smooth / C),
        )

    q = student_bin_logprobs(
        draw.m[:, rf:], draw.log_s[:, rf:], tcfg.classes
    )
    logq = jnp.log(jnp.maximum(q, 1e-12))
    kl = jnp.sum(q * (logq - logp), axis=-1)  # (B, length-rf)
    kl = jnp.mean(kl)

    # audio energy of the draws — pure-KL distillation famously collapses
    # to near-silence ("whisper mode"); watching rms against the data's
    # tells you whether the power loss is weighted strongly enough.
    # BOTH are computed on the UNCLIPPED draw: clip() has zero gradient
    # where |draw| > 1, so a power loss on the clipped signal cannot pull
    # an amplitude explosion back once draws saturate (a one-way ratchet
    # we measured on the chaconne-scale demo — rms pinned at exactly 1.0).
    aux = {"kl": kl, "rms": jnp.sqrt(jnp.mean(draw.x * draw.x))}
    loss = kl
    if power_weight and audio_ref is not None:
        p_loss = jnp.mean(
            (power_spectrum(draw.x) - power_spectrum(audio_ref)) ** 2
        )
        aux["power"] = p_loss
        loss = loss + power_weight * p_loss
    if rms_weight and audio_ref is not None:
        # dedicated amplitude regulator, convex in log-level: the log-
        # power-spectrum L2 alone is an UNSTABLE level control (measured:
        # weight 0.03 lets the student whisper into the teacher's quiet
        # attractor, 0.1 overshoots amplitude 3x), because level trades
        # against unmatched spectral SHAPE inside one term. Pinning level
        # here lets power_weight stay small and govern shape only.
        if rms_per_item:
            # CONDITIONED distillation: the right level is per-window, not
            # the batch marginal. ``audio_ref`` must be the audio at the
            # SAME windows the draws were conditioned on (row i of
            # audio_ref matches draw i's cond timeline); pinning each
            # draw's level to its own window's level teaches the
            # mel->gain mapping. Measured (distill_demo vocoder): the
            # scalar regulator below holds the batch-average at the
            # target yet the student runs 25% hot on held-out mels
            # (per-step batch rms oscillated 0.16-0.30 around a 0.196
            # target); the per-item term is the fix.
            dr = jnp.sqrt(jnp.mean(draw.x * draw.x, axis=-1))   # (B,)
            rr = jnp.sqrt(jnp.mean(audio_ref * audio_ref, axis=-1))
            r_loss = jnp.mean(
                (jnp.log(dr + 1e-6) - jnp.log(rr + 1e-6)) ** 2)
        else:
            r_loss = (
                jnp.log(aux["rms"] + 1e-6)
                - jnp.log(jnp.sqrt(jnp.mean(audio_ref**2)) + 1e-6)) ** 2
        aux["rms_loss"] = r_loss
        loss = loss + rms_weight * r_loss
    return loss, aux


@partial(
    jax.jit,
    static_argnames=("scfg", "tcfg", "tx", "batch_size", "length",
                     "power_weight", "rms_weight", "teacher_smooth",
                     "rms_per_item"),
    donate_argnums=(0, 1),
)
def distill_step(
    student_params: StudentParams,
    opt_state: Any,
    teacher_params: Any,
    scfg: IAFConfig,
    tcfg: WaveNetConfig,
    tx: optax.GradientTransformation,
    key: jax.Array,
    batch_size: int,
    length: int,
    cond: jnp.ndarray | None = None,
    global_cond: jnp.ndarray | None = None,
    audio_ref: jnp.ndarray | None = None,
    power_weight: float = 0.0,
    rms_weight: float = 0.0,
    teacher_smooth: float = 0.0,
    rms_per_item: bool = False,
):
    """One distillation update on the student (teacher frozen). Returns
    ``(student_params, opt_state, loss, aux)``."""
    (loss, aux), grads = jax.value_and_grad(distill_loss, has_aux=True)(
        student_params, teacher_params, scfg, tcfg, key, batch_size, length,
        cond=cond, global_cond=global_cond, audio_ref=audio_ref,
        power_weight=power_weight, rms_weight=rms_weight,
        teacher_smooth=teacher_smooth, rms_per_item=rms_per_item,
    )
    updates, opt_state = tx.update(grads, opt_state, student_params)
    student_params = optax.apply_updates(student_params, updates)
    return student_params, opt_state, loss, aux
