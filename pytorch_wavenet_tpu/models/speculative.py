"""Speculative autoregressive generation: draft-and-verify decoding.

Single-stream AR generation is latency-bound on the serial layer chain —
the fused Pallas kernel's ~8-11 µs/step (ops/pallas/gen_kernel.py) is the
per-step floor for the full teacher. Speculative decoding (Leviathan et
al. 2023, applied here to WaveNet) buys *below* that floor: a small draft
WaveNet proposes ``k`` samples sequentially (cheap steps), then the full
teacher verifies all ``k`` in ONE multi-position window pass over its
cached ring state (models/generate.py gen_step_window) — on the MXU a
``k``-wide trunk pass costs nearly the same wall clock as one step, so the
effective teacher cost per emitted sample divides by the mean accepted
run length.

At temperature 0 the scheme is *exact*: every emitted sample is the
teacher's own argmax (accepted draft samples equal it by construction;
the first mismatch is replaced by the teacher's argmax — the classic
"free correction"), so the rollout is identical to
``generate_fast(temperature=0)`` no matter how bad the draft is. Draft
quality only moves the speed, never the audio.

The reference has no analogue (its generation is wavenet_model.py:237);
this implements docs/ROADMAP.md's "speculative multi-sample decoding"
lever. The whole loop — draft scan, verify window, accept, state commits —
is one ``lax.while_loop`` on device: zero host round trips per iteration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..config import WaveNetConfig
from ..ops.mulaw import mu_law_expansion_jnp
from .generate import (
    GenState,
    commit_window,
    gen_step,
    gen_step_window,
    init_gen_state,
)
from .wavenet import Params


def _prime_state(params, cfg, state, given, chunk=128):
    """Consume ``given (1, n)`` input classes into ``state`` via window
    passes (bulk priming: n/chunk trunk passes instead of n steps)."""
    n = given.shape[1]
    pos = 0
    while pos < n:
        c = min(chunk, n - pos)
        _, pend = gen_step_window(params, cfg, state, given[:, pos:pos + c])
        state = commit_window(state, pend, c)
        pos += c
    return state


@partial(
    jax.jit,
    static_argnames=("tcfg", "dcfg", "num_samples", "k"),
)
def _speculative_jit(
    tparams: Params,
    tcfg: WaveNetConfig,
    dparams: Params,
    dcfg: WaveNetConfig,
    num_samples: int,
    first_samples: jnp.ndarray,
    k: int,
):
    prime = first_samples
    tstate = init_gen_state(tcfg, 1)
    dstate = init_gen_state(dcfg, 1)
    if prime.shape[1] > 1:
        tstate = _prime_state(tparams, tcfg, tstate, prime[:, :-1])
        dstate = _prime_state(dparams, dcfg, dstate, prime[:, :-1])
    cur = prime[:, -1]  # (1,)

    cap = num_samples + k
    out0 = jnp.zeros((1, cap), jnp.int32)

    def cond_fn(carry):
        return carry[4] < num_samples

    def body(carry):
        tstate, dstate, cur, out, cnt, iters = carry

        # 1. draft proposes k samples (argmax), stacking its post-step
        # states so the accepted prefix's state is a gather, not a rerun
        def dstep(c, _):
            st, cls = c
            logits, st2 = gen_step(dparams, dcfg, st, cls)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (st2, nxt), (nxt, st2)

        _, (draft_ys, dstates) = lax.scan(
            dstep, (dstate, cur), None, length=k
        )
        draft_row = draft_ys.T  # (1, k)

        # 2. teacher verifies all k in one window pass; window inputs are
        # [cur, draft_0 .. draft_{k-2}] for times t .. t+k-1
        win = jnp.concatenate([cur[:, None], draft_row[:, :-1]], axis=1)
        logits, pend = gen_step_window(tparams, tcfg, tstate, win)
        targmax = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (1, k)

        # 3. accept the leading run where the draft equals the teacher;
        # the first mismatch position still emits the teacher's argmax
        match = (draft_row[0] == targmax[0]).astype(jnp.int32)
        v = jnp.sum(jnp.cumprod(match))
        a = jnp.minimum(v + 1, k)  # samples emitted this iteration

        # 4. commit exactly the consumed input positions
        tstate = commit_window(tstate, pend, a)
        dstate = jax.tree.map(
            lambda s: lax.dynamic_index_in_dim(s, a - 1, axis=0,
                                               keepdims=False),
            dstates,
        )

        out = lax.dynamic_update_slice(out, targmax, (0, cnt))
        cur = lax.dynamic_slice(
            targmax, (0, jnp.minimum(v, k - 1)), (1, 1)
        )[:, 0]
        return (tstate, dstate, cur, out, cnt + a, iters + 1)

    _, _, _, out, cnt, iters = lax.while_loop(
        cond_fn, body, (tstate, dstate, cur, out0, jnp.int32(0),
                        jnp.int32(0))
    )
    cls = out[:, :num_samples]
    wav = mu_law_expansion_jnp(
        (cls.astype(jnp.float32) / tcfg.classes) * 2.0 - 1.0, tcfg.classes
    )
    # mean accepted samples per verify pass — the speedup driver
    accept_rate = cnt.astype(jnp.float32) / jnp.maximum(iters, 1)
    return wav, cls, accept_rate


def speculative_generate(
    teacher_params: Params,
    tcfg: WaveNetConfig,
    draft_params: Params,
    dcfg: WaveNetConfig,
    key: jax.Array,
    num_samples: int,
    first_samples: jnp.ndarray | None = None,
    k: int = 8,
):
    """Exact argmax generation through draft-and-verify.

    ``first_samples``: int32 ``(1, num_given)`` (or ``(num_given,)``) —
    single stream (speculation is a latency optimization; for throughput
    use the batched kernels). ``k``: speculation depth per verify pass.
    ``key`` is accepted for signature parity and unused (temperature-0
    rollouts are deterministic).

    Returns ``(waveform (1, n), classes (1, n), accept_rate)`` where
    ``accept_rate`` is mean samples emitted per teacher pass (upper bound
    ``k``; the wall-clock win is roughly ``accept_rate`` × the one-step
    path when the draft is much cheaper than the teacher). The classes are
    bitwise what ``generate_fast(..., temperature=0)`` emits.
    """
    del key
    if first_samples is None:
        first_samples = jnp.full((1, 1), tcfg.classes // 2, jnp.int32)
    first_samples = jnp.atleast_2d(first_samples).astype(jnp.int32)
    if first_samples.shape[0] != 1:
        raise ValueError(
            "speculative_generate is single-stream; got "
            f"{first_samples.shape[0]} streams"
        )
    if dcfg.classes != tcfg.classes:
        raise ValueError("draft and teacher must share the codebook")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return _speculative_jit(
        teacher_params, tcfg, draft_params, dcfg, num_samples,
        first_samples, k,
    )
