"""Fused Pallas training-trunk tests (interpret mode on CPU; the compiled
kernel is timed by scripts/benchmark.py --trunk-kernel on real TPU).

The kernel must agree with the XLA trunk (models/wavenet.py:262-315) both
forward (logits, f32-rounding tolerance) and backward: with f32 activation
saves the custom-VJP backward kernel recomputes the exact same math as
``jax.grad`` of the XLA trunk, so gradients match to matmul rounding; the
production bf16 saves are covered by a looser-scale check plus a training
convergence test.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_wavenet_tpu as wt
from pytorch_wavenet_tpu.models.wavenet import (
    embed_inputs,
    init_wavenet,
    wavenet_logits,
)
from pytorch_wavenet_tpu.ops.pallas import trunk_kernel as tk


def _setup(out_len, seed=0, N=2, **cfg_kw):
    cfg = wt.get_config("tiny", **cfg_kw)
    key = jax.random.PRNGKey(seed)
    params = init_wavenet(key, cfg)
    T = cfg.receptive_field + out_len - 1
    x = jax.random.randint(jax.random.fold_in(key, 1), (N, T), 0,
                           cfg.classes)
    return cfg, params, x


def _logits_pair(cfg, params, x, out_len):
    ref = wavenet_logits(params, cfg, x, out_len)
    got = wavenet_logits(
        params, dataclasses.replace(cfg, trunk_kernel=True), x, out_len
    )
    return np.asarray(ref), np.asarray(got)


@pytest.mark.parametrize(
    "kw,N,out_len",
    [
        ({}, 2, 20),               # G=2 pair stacking
        ({}, 3, 20),               # odd batch -> G=1
        ({"kernel_size": 3}, 2, 20),
        ({"bias": False}, 2, 20),
        ({}, 2, 1),                # single-position window
        ({}, 4, 128),              # lane-aligned out -> DMA-out path
        ({"kernel_size": 3}, 2, 256),
    ],
)
def test_forward_matches_xla(kw, N, out_len):
    cfg, params, x = _setup(out_len, N=N, **kw)
    ref, got = _logits_pair(cfg, params, x, out_len)
    np.testing.assert_allclose(got, ref, atol=5e-6, rtol=1e-5)


def test_forward_bf16_stream():
    """cfg.stream_dtype=bf16 applies inside the kernel's VMEM buffers; the
    result tracks the (different-rounding) XLA bf16-stream trunk at bf16
    scale."""
    cfg, params, x = _setup(20, stream_dtype=jnp.bfloat16)
    ref, got = _logits_pair(cfg, params, x, 20)
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)


def _grad_pair(cfg, params, x, out_len, save_dtype):
    tgt = jax.random.randint(jax.random.PRNGKey(9), (x.shape[0], out_len),
                             0, cfg.classes)

    def loss(p, c):
        ls = jax.nn.log_softmax(wavenet_logits(p, c, x, out_len))
        return -jnp.mean(jnp.take_along_axis(ls, tgt[..., None], axis=-1))

    g_ref = jax.grad(loss)(params, cfg)
    # pin the kernel's save dtype for the comparison
    import functools

    orig = tk.fused_trunk
    try:
        tk.fused_trunk = functools.partial(orig, save_dtype=save_dtype)
        g_got = jax.grad(loss)(
            params, dataclasses.replace(cfg, trunk_kernel=True)
        )
    finally:
        tk.fused_trunk = orig
    return g_ref, g_got


def _assert_grads_close(g_ref, g_got, rel):
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_g = jax.tree_util.tree_leaves(g_got)
    for (path, r), g in zip(flat_r, flat_g):
        err = float(jnp.max(jnp.abs(r - g)))
        scale = float(jnp.max(jnp.abs(r))) + 1e-30
        assert err <= rel * max(1.0, scale), (
            f"{jax.tree_util.keystr(path)}: err {err:.3e} scale {scale:.3e}"
        )


@pytest.mark.parametrize(
    "kw,N,out_len",
    [
        ({}, 2, 20),
        ({}, 3, 20),               # G=1
        ({"kernel_size": 3}, 2, 20),
        ({"bias": False}, 2, 20),
        ({}, 4, 128),              # DMA-out path backward
    ],
)
def test_grads_exact_with_f32_saves(kw, N, out_len):
    """The backward kernel's math is exact: f32 saves -> grads match
    jax.grad of the XLA trunk to matmul rounding."""
    cfg, params, x = _setup(out_len, N=N, **kw)
    g_ref, g_got = _grad_pair(cfg, params, x, out_len, jnp.float32)
    _assert_grads_close(g_ref, g_got, 1e-5)


def test_grads_bf16_saves_scale():
    """Production bf16 activation saves: grads agree at bf16 scale."""
    cfg, params, x = _setup(20)
    g_ref, g_got = _grad_pair(cfg, params, x, 20, jnp.bfloat16)
    _assert_grads_close(g_ref, g_got, 2e-2)


def test_h0_grad_flows():
    """Cotangent w.r.t. the embedded stream reaches the start conv (the
    embedding gather's vjp consumes dh0 through the kernel's pad/reshape)."""
    cfg, params, x = _setup(20)
    cfg_k = dataclasses.replace(cfg, trunk_kernel=True)

    def loss(p):
        return jnp.sum(wavenet_logits(p, cfg_k, x, 20) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.max(jnp.abs(g["start"]["w"]))) > 0.0


def test_inference_path_skips_saves():
    """Without grad, the primal runs save=False (no hsave output): just
    assert the forward value is produced and finite under jit."""
    cfg, params, x = _setup(20)
    cfg_k = dataclasses.replace(cfg, trunk_kernel=True)
    y = jax.jit(wavenet_logits, static_argnums=(1, 3))(params, cfg_k, x, 20)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_train_step_converges():
    """A few optimizer steps through the fused trunk reduce the loss on a
    fixed batch — the custom VJP trains, not just matches pointwise."""
    import optax

    from pytorch_wavenet_tpu.training.trainer import train_step

    cfg = wt.get_config("tiny", trunk_kernel=True)
    params = init_wavenet(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    out_len = cfg.output_length
    x = jax.random.randint(
        jax.random.PRNGKey(1), (2, cfg.receptive_field + out_len - 1), 0,
        cfg.classes,
    )
    y = jax.random.randint(jax.random.PRNGKey(2), (2, out_len), 0,
                           cfg.classes)
    params = jax.tree.map(jnp.copy, params)
    first = None
    for _ in range(8):
        params, opt_state, loss, _ = train_step(
            params, opt_state, cfg, tx, x, y
        )
        if first is None:
            first = float(loss)
    assert float(loss) < first


def test_rejects_wrong_window():
    cfg, params, x = _setup(20)
    h0 = embed_inputs(params, cfg, x)
    with pytest.raises(ValueError, match="receptive_field"):
        tk.fused_trunk(params, cfg, h0[:, :-1], 20)


@pytest.mark.parametrize(
    "kw,N,out_len",
    [
        ({"cond_channels": 6}, 2, 20),       # M padded 6 -> 16
        ({"cond_channels": 16}, 3, 20),      # aligned M, G=1 (odd batch)
        ({"cond_channels": 6, "kernel_size": 3}, 2, 128),  # DMA-out path
    ],
)
def test_conditioned_forward_and_grads(kw, N, out_len):
    """Local conditioning rides in-kernel (the vocoder training path):
    forward matches the XLA conditioned trunk, and grads — including
    d(cond), which the learnable upsampler needs — are exact under f32
    saves."""
    import functools

    cfg, params, x = _setup(out_len, N=N, **kw)
    cond = jax.random.normal(
        jax.random.PRNGKey(5), (N, x.shape[1], cfg.cond_channels)
    ) * 0.3
    cfg_k = dataclasses.replace(cfg, trunk_kernel=True)
    ref = wavenet_logits(params, cfg, x, out_len, cond=cond)
    got = wavenet_logits(params, cfg_k, x, out_len, cond=cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-6, rtol=1e-5)

    tgt = jax.random.randint(jax.random.PRNGKey(9), (N, out_len), 0,
                             cfg.classes)

    def loss(p, c, cnd):
        ls = jax.nn.log_softmax(wavenet_logits(p, c, x, out_len, cond=cnd))
        return -jnp.mean(jnp.take_along_axis(ls, tgt[..., None], axis=-1))

    g_ref = jax.grad(loss, argnums=(0, 2))(params, cfg, cond)
    orig = tk.fused_trunk
    try:
        tk.fused_trunk = functools.partial(orig, save_dtype=jnp.float32)
        g_got = jax.grad(loss, argnums=(0, 2))(params, cfg_k, cond)
    finally:
        tk.fused_trunk = orig
    _assert_grads_close(g_ref, g_got, 1e-5)


def test_global_cond_falls_back():
    """global_cond still takes the XLA trunk (no kernel support): results
    agree because it IS the same path — and the fallback is LOUD (a
    RuntimeWarning naming the cause and the measured cost, VERDICT r3 #6)."""
    from pytorch_wavenet_tpu.models import wavenet as wnet

    cfg = wt.get_config("tiny", gcond_channels=4)
    cfg_k = dataclasses.replace(cfg, trunk_kernel=True)
    params = init_wavenet(jax.random.PRNGKey(0), cfg)
    out_len = 12
    T = cfg.receptive_field + out_len - 1
    x = jax.random.randint(jax.random.PRNGKey(1), (2, T), 0, cfg.classes)
    g = jax.random.normal(jax.random.PRNGKey(2), (2, 4))
    ref = wavenet_logits(params, cfg, x, out_len, global_cond=g)
    wnet._trunk_fallback_warned.clear()
    with pytest.warns(RuntimeWarning, match="falling back to the XLA trunk"):
        got = wavenet_logits(params, cfg_k, x, out_len, global_cond=g)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fallback_warns_once_per_reason():
    """The warning fires once per distinct cause, not once per step."""
    import warnings as _warnings

    from pytorch_wavenet_tpu.models import wavenet as wnet

    cfg_k = wt.get_config("tiny", kernel_size=1, trunk_kernel=True)
    params = init_wavenet(jax.random.PRNGKey(0), cfg_k)
    T = cfg_k.receptive_field + 11
    x = jax.random.randint(jax.random.PRNGKey(1), (2, T), 0, cfg_k.classes)
    wnet._trunk_fallback_warned.clear()
    with pytest.warns(RuntimeWarning, match="kernel_size=1"):
        wavenet_logits(params, cfg_k, x, 12)
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        wavenet_logits(params, cfg_k, x, 12)  # second call: silent


def test_longer_window_slices_to_trailing():
    """wavenet_logits' contract allows T >= rf + out_len - 1; the kernel
    path slices the trailing window like the XLA trunk instead of
    raising (review finding round 3)."""
    cfg, params, x = _setup(12, N=2)
    cfg_k = dataclasses.replace(cfg, trunk_kernel=True)
    pad = jax.random.randint(jax.random.PRNGKey(7), (2, 5), 0, cfg.classes)
    xl = jnp.concatenate([pad, x], axis=1)  # T = win + 5
    ref = wavenet_logits(params, cfg, xl, 12)
    got = wavenet_logits(params, cfg_k, xl, 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-6, rtol=1e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="bf16 emission exists only on the TPU backend")
def test_bf16_emission_bitwise_on_tpu():
    """Hardware session guard (VERDICT r4 #5): the production bf16
    gated-unit emission must stay bitwise-neutral vs f32 emission through
    the skip contraction. bench.py runs the same check every driver run."""
    from pytorch_wavenet_tpu.utils.checks import verify_bf16_emission

    assert verify_bf16_emission()
