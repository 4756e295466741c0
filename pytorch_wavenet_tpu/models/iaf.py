"""Inverse-autoregressive-flow student for Parallel-WaveNet distillation.

The AR teacher (models/wavenet.py) samples one step at a time — a serial
chain the fused kernels (ops/pallas/gen_kernel*.py) push to ~8-15 µs/step,
but still fundamentally latency-bound. The IAF student removes the serial
chain entirely: audio is one *dense parallel* transform of white logistic
noise,

    x = flow_F( ... flow_1(z) ... ),      z_t ~ Logistic(0, 1)

where each flow is a small causal WaveNet over the *noise* (not the audio):
``z'_t = z_t * s_t + mu_t`` with ``(mu_t, log s_t)`` functions of
``z_{<t}`` only. Because the autoregression is over the fully-known input,
a flow evaluates all T steps in one teacher-forced trunk pass — F trunk
passes total, every FLOP an MXU matmul over the whole clip. That is the
TPU-shaped answer to generation latency: O(1) sequential steps instead of
O(T) (van den Oord et al. 2018, "Parallel WaveNet"; out of the reference's
scope — its fastest path is generate_fast, wavenet_model.py:237 — but the
natural serving step beyond it, docs/ROADMAP.md).

The per-step output conditional stays closed-form through the affine
composition: given the noise history, ``x_t ~ Logistic(m_t, s_tot_t)`` with
``m`` and ``s_tot`` accumulated across flows — which is what probability
density distillation trains against (training/distill.py).

Flow trunks reuse the teacher's layout conventions: stacked per-layer
params on a leading L axis, statically-unrolled dilation taps with
zero-padded history (models/wavenet.py wavenet_logits), so the whole
student is jit/grad/shard-friendly with static shapes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WaveNetConfig  # noqa: F401  (doc cross-reference)
from .wavenet import _conv_init, _mm

StudentParams = Any


@dataclasses.dataclass(frozen=True)
class IAFConfig:
    """Student architecture. Flows share one shape; dilations reset per
    block like the teacher (WaveNetConfig.dilations)."""

    flows: int = 4
    layers: int = 10
    blocks: int = 1
    residual_channels: int = 64
    dilation_channels: int = 64
    skip_channels: int = 64
    end_channels: int = 64
    kernel_size: int = 2
    cond_channels: int = 0
    gcond_channels: int = 0
    bias: bool = True
    compute_dtype: Any = jnp.float32

    @property
    def dilations(self) -> tuple[int, ...]:
        return tuple(
            2 ** l for _ in range(self.blocks) for l in range(self.layers)
        )

    @property
    def num_layers(self) -> int:
        return self.layers * self.blocks

    @property
    def receptive_field(self) -> int:
        return 1 + self.blocks * (self.kernel_size - 1) * (
            2 ** self.layers - 1
        )


class StudentSample(NamedTuple):
    """One parallel draw from the student.

    ``x``: audio ``(B, T)``; ``m``/``log_s``: per-step output-conditional
    Logistic(loc, scale) parameters given the noise history (the
    distillation target's counterpart); ``z0``: the base noise;
    ``log_q``: per-clip log-density ``(B,)`` of the draw under the student
    (base logpdf minus the summed log-scales — change of variables).
    """

    x: jnp.ndarray
    m: jnp.ndarray
    log_s: jnp.ndarray
    z0: jnp.ndarray
    log_q: jnp.ndarray


def init_student(key: jax.Array, scfg: IAFConfig,
                 init_scale: float = 1.0) -> StudentParams:
    """Per-flow params mirror the teacher's stacked layout
    (models/wavenet.py init_wavenet); the final head is zero-initialized so
    every flow starts as the identity (mu=0, log_s=0) — the student begins
    as pure logistic noise and distillation moves it toward the teacher.

    ``init_scale`` < 1 starts the LAST flow contractive (its log_s bias
    set so the composed transform is ``x ~ init_scale * z0``): pure
    Logistic(0,1) noise has std ~1.81, far outside typical audio range,
    and a mu-law teacher's log-prob is FLAT at saturated amplitudes — a
    student initialized there gets no KL gradient and distillation stalls
    at a constant KL (measured on the chaconne-scale demo). Match the
    data: ``init_scale ~ data_rms / 1.81``."""
    L = scfg.num_layers
    k = scfg.kernel_size
    R, D, S, E = (scfg.residual_channels, scfg.dilation_channels,
                  scfg.skip_channels, scfg.end_channels)
    flows = []
    for f in range(scfg.flows):
        keys = jax.random.split(jax.random.fold_in(key, f), 12)
        fp = {
            "start": {"w": _conv_init(keys[0], (1, R), 1)},
            "layers": {
                "w_in": _conv_init(keys[1], (L, k, R, 2 * D), R * k),
                "w_res": _conv_init(keys[2], (L, D, R), D),
                "w_skip": _conv_init(keys[3], (L, D, S), D),
            },
            "end1": {
                "w": _conv_init(keys[4], (S, E), S),
                "b": jnp.zeros((E,), jnp.float32),
            },
            "end2": {
                "w": jnp.zeros((E, 2), jnp.float32),
                "b": jnp.zeros((2,), jnp.float32),
            },
        }
        if scfg.bias:
            fp["start"]["b"] = _conv_init(keys[5], (R,), 1)
            fp["layers"]["b_in"] = _conv_init(keys[6], (L, 2 * D), R * k)
            fp["layers"]["b_res"] = _conv_init(keys[7], (L, R), D)
            fp["layers"]["b_skip"] = _conv_init(keys[8], (L, S), D)
        if scfg.cond_channels:
            fp["layers"]["w_cond"] = _conv_init(
                keys[9], (L, scfg.cond_channels, 2 * D), scfg.cond_channels
            )
        if scfg.gcond_channels:
            fp["layers"]["w_gcond"] = _conv_init(
                keys[10], (L, scfg.gcond_channels, 2 * D),
                scfg.gcond_channels,
            )
        flows.append(fp)
    if init_scale != 1.0:
        # invert flow_transform's soft bound log_s = 7*tanh(b/7) so the
        # composed scale starts at exactly init_scale
        tgt = float(np.log(init_scale))
        if abs(tgt) >= 7.0:
            raise ValueError(f"init_scale {init_scale} outside the "
                             "log-scale soft bound (+/-7 nats)")
        b = 7.0 * float(np.arctanh(tgt / 7.0))
        flows[-1]["end2"]["b"] = jnp.asarray([0.0, b], jnp.float32)
    return {"flows": tuple(flows)}


def flow_transform(
    fp: StudentParams,
    scfg: IAFConfig,
    z: jnp.ndarray,
    cond: jnp.ndarray | None = None,
    global_cond: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One flow's ``(mu, log_s)``, each ``(B, T)``, from ``z (B, T)``.

    Causality: the input is shifted one step right before the trunk, so
    position t sees ``z_{<t}`` only (out-of-range history is zero, same
    zero-pad convention as the teacher trunk's taps,
    models/wavenet.py:262-272). ``cond`` rows align with *output*
    positions — conditioning for step t is known at step t, so it is not
    shifted."""
    k = scfg.kernel_size
    cdt = scfg.compute_dtype
    B, T = z.shape

    zin = jnp.pad(z[:, :-1], ((0, 0), (1, 0)))[..., None]  # (B, T, 1)
    h = _mm(zin, fp["start"]["w"], cdt)
    if "b" in fp["start"]:
        h = h + fp["start"]["b"]
    h = h.astype(jnp.float32)

    lp = fp["layers"]
    skip = jnp.zeros((B, T, scfg.skip_channels), jnp.float32)
    for l, d in enumerate(scfg.dilations):
        z_ = _mm(h, lp["w_in"][l, k - 1], cdt)
        for j in range(k - 1):
            shift = (k - 1 - j) * d
            tap = jnp.pad(h, ((0, 0), (shift, 0), (0, 0)))[:, :T, :]
            z_ = z_ + _mm(tap, lp["w_in"][l, j], cdt)
        if cond is not None:
            z_ = z_ + _mm(cond, lp["w_cond"][l], cdt)
        if global_cond is not None:
            z_ = z_ + _mm(global_cond, lp["w_gcond"][l], cdt)[:, None, :]
        if "b_in" in lp:
            z_ = z_ + lp["b_in"][l]
        f, g = jnp.split(z_, 2, axis=-1)
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
    y = jax.nn.relu(_mm(y, fp["end1"]["w"], cdt) + fp["end1"]["b"])
    out = _mm(y, fp["end2"]["w"], cdt) + fp["end2"]["b"]  # (B, T, 2)
    mu, log_s = out[..., 0], out[..., 1]
    # soft-bounded log-scale: linear near 0, saturates at +/-7 — keeps
    # exp(log_s) finite under early-training excursions without the dead
    # gradients of a hard clip
    log_s = 7.0 * jnp.tanh(log_s / 7.0)
    return mu, log_s


def _logistic_logpdf(z: jnp.ndarray) -> jnp.ndarray:
    """log pdf of Logistic(0, 1): -z - 2*softplus(-z)."""
    return -z - 2.0 * jax.nn.softplus(-z)


def student_sample(
    params: StudentParams,
    scfg: IAFConfig,
    key: jax.Array,
    shape: tuple[int, int],
    cond: jnp.ndarray | None = None,
    global_cond: jnp.ndarray | None = None,
) -> StudentSample:
    """Draw ``shape = (B, T)`` audio in one parallel pass (F flow trunks).

    Differentiable in ``params`` via the reparameterized base noise — the
    pathwise estimator probability density distillation needs."""
    if cond is not None and scfg.cond_channels == 0:
        raise ValueError("cond given but scfg.cond_channels == 0")
    if global_cond is not None and scfg.gcond_channels == 0:
        raise ValueError("global_cond given but scfg.gcond_channels == 0")
    B, T = shape
    u = jax.random.uniform(key, (B, T), jnp.float32, 1e-5, 1.0 - 1e-5)
    z0 = jnp.log(u) - jnp.log1p(-u)  # Logistic(0, 1)

    z = z0
    m = jnp.zeros((B, T), jnp.float32)
    log_s_tot = jnp.zeros((B, T), jnp.float32)
    for fp in params["flows"]:
        mu, log_s = flow_transform(fp, scfg, z, cond, global_cond)
        s = jnp.exp(log_s)
        z = z * s + mu
        m = m * s + mu
        log_s_tot = log_s_tot + log_s

    log_q = jnp.sum(_logistic_logpdf(z0) - log_s_tot, axis=1)
    return StudentSample(x=z, m=m, log_s=log_s_tot, z0=z0, log_q=log_q)


@partial(jax.jit, static_argnames=("scfg", "num_samples", "num_streams"))
def student_generate(
    params: StudentParams,
    scfg: IAFConfig,
    key: jax.Array,
    num_samples: int,
    num_streams: int = 1,
    cond: jnp.ndarray | None = None,
    global_cond: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Serving entry: ``(num_streams, num_samples)`` float32 audio in
    [-1, 1], one parallel pass — no autoregression, no ring buffers, no
    per-step dispatch. Compare models/generate.py generate_fast (the AR
    teacher's fastest exact path)."""
    out = student_sample(params, scfg, key, (num_streams, num_samples),
                         cond=cond, global_cond=global_cond)
    return jnp.clip(out.x, -1.0, 1.0)


def student_parameter_count(params: StudentParams) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def load_student_snapshot(path: str, scfg: IAFConfig | None = None):
    """Load a student checkpoint written by ``scripts/distill.py``:
    returns ``(params, scfg, step)``. The architecture is restored from
    the checkpoint's ``iaf_config`` extra; ``scfg`` (optional) supplies
    defaults for fields the snapshot stored as None (compute_dtype)."""
    import dataclasses

    from flax import serialization

    from ..utils.checkpoints import load_checkpoint

    blob = load_checkpoint(path)
    scfg = scfg or IAFConfig()
    saved = (blob.get("extra") or {}).get("iaf_config")
    if saved:
        names = {f.name for f in dataclasses.fields(scfg)}
        scfg = dataclasses.replace(
            scfg, **{k: v for k, v in saved.items()
                     if k in names and v is not None})
    template = init_student(jax.random.PRNGKey(0), scfg)
    params = serialization.from_state_dict(template, blob["params"])
    return params, scfg, blob["step"]


def student_synthesize(
    params: StudentParams,
    scfg: IAFConfig,
    key: jax.Array,
    mel: jnp.ndarray,
    hop_length: int,
    num_samples: int | None = None,
    global_cond: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mel frames -> audio in ONE dense parallel pass — the
    Parallel-WaveNet vocoder deployment (the whole point of distilling:
    arXiv:1711.10433 serves exactly this shape). ``mel`` is
    ``(S, F, cond_channels)`` (or 2-D for one stream) of log-mel frames
    at ``hop_length``-sample resolution; frames are linearly upsampled to
    per-sample rows aligned with output positions (the student's cond
    contract). Counterpart of the AR :func:`models.generate.synthesize`.
    Returns ``(S, num_samples)`` float32 in [-1, 1]."""
    if scfg.cond_channels == 0:
        raise ValueError("this student is unconditional "
                         "(scfg.cond_channels == 0)")
    if mel.ndim == 2:
        mel = mel[None]
    S, F, M = mel.shape
    if M != scfg.cond_channels:
        raise ValueError(f"mel has {M} channels but scfg.cond_channels "
                         f"is {scfg.cond_channels}")
    if num_samples is None:
        num_samples = F * hop_length
    from ..ops.mel import upsample_frames

    rows = upsample_frames(jnp.asarray(mel, jnp.float32), hop_length,
                           num_samples)
    return student_generate(params, scfg, key, num_samples,
                            num_streams=S, cond=rows,
                            global_cond=global_cond)
