"""Fused Pallas generation kernel.

The entire autoregressive loop — ring-buffer update, gated dilated convs,
residual/skip, output head, temperature sampling, feedback — runs inside ONE
``pallas_call``. All weights and all per-layer ring buffers live in VMEM for
the whole clip: after the initial weight load there is no HBM traffic except
streaming out the sampled classes. This is the TPU-native replacement for
the reference's per-step Python loop over 30-40 ``DilatedQueue`` objects with
a host round-trip per sample (reference: wavenet_model.py:276-311,
wavenet_modules.py:42-77), and the "fused single-step kernel" SURVEY.md §7
calls for.

Design notes (what makes this fast):

* the layer loop is **statically unrolled** — each layer's dilation is a
  compile-time constant, so every ring buffer is sized exactly
  ``(kernel_size-1)*d + 1`` and indexed with cheap static-modulus arithmetic
  (slot ``t mod P``; for k=2 the read slot is just ``(t+1) mod P``);
* per layer: one tap dot per kernel tap (the tap dots are mutually
  independent, off the critical path until the add) and one fused
  ``(1, D) @ (D, S+R)`` skip|residual output dot. No lane concatenation —
  cross-lane shuffles cost more than an extra small dot. The gated unit
  stays ``tanh(f)*sigmoid(g)`` exactly so the argmax rollout is bit-identical
  to the XLA paths;
* sampling uses the on-core PRNG (Gumbel-argmax over tempered logits), so
  temperature>0 draws differ from the XLA path's inverse-CDF stream;
  temperature=0 (argmax) matches the XLA and naive paths exactly, which the
  equivalence tests pin.

VMEM budget (f32): weights ~4.5 MB for the chaconne config + ring buffers
``sum_l ((k-1)*d_l+1) * R`` ~= 2*receptive_field*R ~ 0.8 MB — comfortably
under the ~16 MB/core limit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import WaveNetConfig
from ...models.wavenet import Params
from ...ops.mulaw import mu_law_expansion_jnp


def _make_kernel(cfg: WaveNetConfig, num_given: int, total: int,
                 temperature: float, regularize: float):
    L = cfg.num_layers
    k = cfg.kernel_size
    D = cfg.dilation_channels
    S = cfg.skip_channels
    dil = cfg.dilations
    periods = [(k - 1) * d + 1 for d in dil]

    def kernel(
        prime_ref,   # scalar prefetch: (num_given,) int32 prime classes
        seed_ref,    # (1, 1) int32
        w_start_ref, # (C, R)
        b_start_ref, # (1, R)
        w_tap_ref,   # (L, k, R, 2D) fused filter+gate per tap
        b_in_ref,    # (L, 2D)
        w_out_ref,   # (L, D, S+R) fused skip|residual
        b_out_ref,   # (L, S+R)
        w_end1_ref,  # (S, E)
        b_end1_ref,  # (1, E)
        w_end2_ref,  # (E, C)
        b_end2_ref,  # (1, C)
        out_ref,     # (total, 1) int32 sampled classes
        *buf_refs,   # L scratch ring buffers, (P_l, R) each
    ):
        if temperature > 0:  # static; argmax path never consumes randomness
            pltpu.prng_seed(seed_ref[0, 0])
        for b in buf_refs:
            b[...] = jnp.zeros_like(b)

        if regularize != 0.0:
            reg = (
                lax.broadcasted_iota(jnp.float32, (1, cfg.classes), 1)
                - cfg.classes / 2.0
            ) ** 2 * regularize
        else:
            reg = None

        def step(t, cls):
            h = w_start_ref[pl.ds(cls, 1), :] + b_start_ref[...]  # (1, R)
            skip = jnp.zeros((1, S), jnp.float32)

            for l in range(L):  # statically unrolled
                d, P = dil[l], periods[l]
                buf = buf_refs[l]
                # k taps: current h plus k-1 ring reads at
                # (t - (k-1-j)*d) mod P (reference dequeue,
                # wavenet_modules.py:59-72). One dot per tap; the ring-tap
                # dots don't depend on h, so they overlap the critical path.
                z = jnp.dot(
                    h, w_tap_ref[l, k - 1], preferred_element_type=jnp.float32
                ) + b_in_ref[pl.ds(l, 1), :]
                for j in range(k - 1):
                    ridx = (t - (k - 1 - j) * d) % P
                    tap = buf[pl.ds(ridx, 1), :]
                    z = z + jnp.dot(
                        tap, w_tap_ref[l, j], preferred_element_type=jnp.float32
                    )
                u = jnp.tanh(z[:, :D]) * jax.nn.sigmoid(z[:, D:])  # (1, D)
                sr = (
                    jnp.dot(u, w_out_ref[l],
                            preferred_element_type=jnp.float32)
                    + b_out_ref[pl.ds(l, 1), :]
                )  # (1, S+R)
                skip = skip + sr[:, :S]
                # ring write after the reads (reference enqueue,
                # wavenet_modules.py:55-57)
                buf[pl.ds(t % P, 1), :] = h
                h = h + sr[:, S:]

            # head (reference: wavenet_model.py:167-170)
            y = jnp.maximum(skip, 0.0)
            y = jnp.maximum(
                jnp.dot(y, w_end1_ref[...],
                        preferred_element_type=jnp.float32)
                + b_end1_ref[...],
                0.0,
            )
            logits = (
                jnp.dot(y, w_end2_ref[...],
                        preferred_element_type=jnp.float32)
                + b_end2_ref[...]
            )  # (1, C)
            if reg is not None:
                logits = logits - reg

            if temperature > 0:
                bits = pltpu.bitcast(
                    pltpu.prng_random_bits((1, cfg.classes)), jnp.uint32
                )
                # top 24 bits -> uniform [0,1); >>8 clears the sign bit so
                # the int32 view equals the uint32 value (Mosaic has no
                # uint32->f32 cast)
                bits24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
                u01 = bits24.astype(jnp.float32) * (1.0 / (1 << 24))
                u01 = jnp.clip(u01, 1e-7, 1.0 - 1e-7)
                gumbel = -jnp.log(-jnp.log(u01))
                sampled = jnp.argmax(logits / temperature + gumbel, axis=-1)[0]
            else:
                sampled = jnp.argmax(logits, axis=-1)[0]
            sampled = sampled.astype(jnp.int32)

            out_ref[pl.ds(t, 1), :] = sampled.reshape(1, 1)

            # next input: prime while priming, else the sample
            in_prime = t + 1 < num_given
            nxt = jnp.where(
                in_prime, prime_ref[jnp.minimum(t + 1, num_given - 1)], sampled
            )
            return nxt

        lax.fori_loop(0, total, step, prime_ref[0])

    return kernel, periods


@partial(
    jax.jit,
    static_argnames=("cfg", "num_samples", "temperature", "regularize", "interpret"),
)
def generate_fast_fused(
    params: Params,
    cfg: WaveNetConfig,
    key: jax.Array,
    num_samples: int,
    first_samples: jnp.ndarray | None = None,
    temperature: float = 1.0,
    regularize: float = 0.0,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-stream fused generation. Same contract as
    ``models.generate.generate_fast`` with S=1: returns
    ``(waveform (1, num_samples), classes (1, num_samples))``."""
    if first_samples is None:
        first_samples = jnp.full((1, 1), cfg.classes // 2, jnp.int32)
    first_samples = jnp.atleast_2d(first_samples).astype(jnp.int32)
    assert first_samples.shape[0] == 1, (
        "fused kernel is single-stream; use generate_fast for batches"
    )
    num_given = first_samples.shape[1]
    total = num_given - 1 + num_samples

    L, k = cfg.num_layers, cfg.kernel_size
    R, D, S, E, C = (
        cfg.residual_channels, cfg.dilation_channels, cfg.skip_channels,
        cfg.end_channels, cfg.classes,
    )
    f32 = jnp.float32
    lp = params["layers"]

    # fused weights: filter|gate per tap (L,k,R,2D); [skip|res] -> (L,D,S+R)
    w_tap = lp["w_in"].astype(f32)
    w_out = jnp.concatenate(
        [lp["w_skip"].astype(f32), lp["w_res"].astype(f32)], axis=2
    )
    b_in = lp.get("b_in", jnp.zeros((L, 2 * D))).astype(f32)
    b_out = jnp.concatenate(
        [
            lp.get("b_skip", jnp.zeros((L, S))).astype(f32),
            lp.get("b_res", jnp.zeros((L, R))).astype(f32),
        ],
        axis=1,
    )

    args = (
        jax.random.randint(key, (1, 1), 0, np.iinfo(np.int32).max, jnp.int32),
        params["start"]["w"].astype(f32),
        params["start"].get("b", jnp.zeros((R,))).reshape(1, R).astype(f32),
        w_tap,
        b_in,
        w_out,
        b_out,
        params["end1"]["w"].astype(f32),
        params["end1"]["b"].reshape(1, E).astype(f32),
        params["end2"]["w"].astype(f32),
        params["end2"]["b"].reshape(1, C).astype(f32),
    )

    kernel, periods = _make_kernel(
        cfg, num_given, total, float(temperature), float(regularize)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((P, R), f32) for P in periods],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((total, 1), jnp.int32),
        interpret=interpret,
    )(first_samples[0], *args)

    cls = out[num_given - 1 :, 0][None, :]  # (1, num_samples)
    wav = mu_law_expansion_jnp(
        (cls.astype(jnp.float32) / cfg.classes) * 2.0 - 1.0, cfg.classes
    )
    return wav, cls
