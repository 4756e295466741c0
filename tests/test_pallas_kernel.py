"""Fused Pallas generation kernel tests (interpret mode on CPU; the compiled
path is exercised and timed by bench.py on real TPU hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_wavenet_tpu as wt
from pytorch_wavenet_tpu.ops.pallas.gen_kernel import generate_fast_fused


@pytest.fixture(scope="module")
def tiny():
    cfg = wt.get_config("tiny")
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_fused_matches_xla_argmax(tiny):
    cfg, params = tiny
    prime = jax.random.randint(
        jax.random.PRNGKey(2), (1, cfg.receptive_field), 0, cfg.classes
    )
    k = jax.random.PRNGKey(3)
    _, cf = generate_fast_fused(params, cfg, k, 48, prime, temperature=0.0,
                                interpret=True)
    _, cx = wt.generate_fast(params, cfg, k, 48, prime, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(cf), np.asarray(cx))


def test_fused_matches_xla_short_prime(tiny):
    """Priming semantics (queue zero-init + sample-by-sample prime) match
    (reference: wavenet_model.py:250-269)."""
    cfg, params = tiny
    prime = jnp.asarray([[3, 7, 11]], jnp.int32)
    k = jax.random.PRNGKey(4)
    _, cf = generate_fast_fused(params, cfg, k, 32, prime, temperature=0.0,
                                interpret=True)
    _, cx = wt.generate_fast(params, cfg, k, 32, prime, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(cf), np.asarray(cx))


def test_fused_default_prime(tiny):
    cfg, params = tiny
    _, cf = generate_fast_fused(params, cfg, jax.random.PRNGKey(0), 8,
                                temperature=0.0, interpret=True)
    _, cx = wt.generate_fast(params, cfg, jax.random.PRNGKey(0), 8,
                             temperature=0.0)
    np.testing.assert_array_equal(np.asarray(cf), np.asarray(cx))


def test_fused_wraparound(tiny):
    """Longer than every ring buffer: exercises wraparound overwrites."""
    cfg, params = tiny
    from pytorch_wavenet_tpu.models.generate import buffer_length

    n = 2 * buffer_length(cfg) + 3
    prime = jax.random.randint(
        jax.random.PRNGKey(7), (1, cfg.receptive_field), 0, cfg.classes
    )
    k = jax.random.PRNGKey(8)
    _, cf = generate_fast_fused(params, cfg, k, n, prime, temperature=0.0,
                                interpret=True)
    _, cx = wt.generate_fast(params, cfg, k, n, prime, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(cf), np.asarray(cx))


def test_fused_regularizer(tiny):
    """The quadratic regularizer shifts argmax decisions the same way as the
    XLA path (reference: wavenet_model.py:273-274,280)."""
    cfg, params = tiny
    prime = jax.random.randint(
        jax.random.PRNGKey(9), (1, cfg.receptive_field), 0, cfg.classes
    )
    k = jax.random.PRNGKey(10)
    _, cf = generate_fast_fused(params, cfg, k, 24, prime, temperature=0.0,
                                regularize=0.05, interpret=True)
    _, cx = wt.generate_fast(params, cfg, k, 24, prime, temperature=0.0,
                             regularize=0.05)
    np.testing.assert_array_equal(np.asarray(cf), np.asarray(cx))


def test_fused_multistream_matches_xla(tiny):
    """4 independent streams in one kernel, all matching the XLA path."""
    cfg, params = tiny
    prime = jax.random.randint(
        jax.random.PRNGKey(12), (4, cfg.receptive_field), 0, cfg.classes
    )
    k = jax.random.PRNGKey(13)
    _, cf = generate_fast_fused(params, cfg, k, 24, prime, temperature=0.0,
                                interpret=True)
    _, cx = wt.generate_fast(params, cfg, k, 24, prime, temperature=0.0)
    assert cf.shape == (4, 24)
    np.testing.assert_array_equal(np.asarray(cf), np.asarray(cx))


def test_fused_rejects_oversized_stream_count(tiny):
    cfg, params = tiny
    from pytorch_wavenet_tpu.ops.pallas.gen_kernel import fused_vmem_bytes

    assert fused_vmem_bytes(cfg, 1) < fused_vmem_bytes(cfg, 8)
    prime = jnp.zeros((100000, 4), jnp.int32)
    with pytest.raises(ValueError):
        generate_fast_fused(params, cfg, jax.random.PRNGKey(0), 8, prime,
                            temperature=0.0, interpret=True)


def test_fused_kernel_size_3():
    """General-k tap indexing in the fused kernel (two ring reads per
    layer)."""
    cfg = wt.get_config("tiny", kernel_size=3)
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    prime = jax.random.randint(
        jax.random.PRNGKey(1), (1, cfg.receptive_field), 0, cfg.classes
    )
    k = jax.random.PRNGKey(2)
    _, cf = generate_fast_fused(params, cfg, k, 24, prime, temperature=0.0,
                                interpret=True)
    _, cx = wt.generate_fast(params, cfg, k, 24, prime, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(cf), np.asarray(cx))


def test_fused_streaming_state_bitwise(tiny):
    """Chunked rollout with FusedGenState equals single-shot bitwise."""
    cfg, params = tiny
    rf = cfg.receptive_field
    prime = jax.random.randint(jax.random.PRNGKey(21), (2, rf), 0, cfg.classes)
    k = jax.random.PRNGKey(22)
    _, c_all = generate_fast_fused(params, cfg, k, 60, prime, temperature=0.0,
                                   interpret=True)
    _, c1, st = generate_fast_fused(params, cfg, k, 25, prime, temperature=0.0,
                                    return_state=True, interpret=True)
    _, c2, st = generate_fast_fused(params, cfg, k, 20, None, temperature=0.0,
                                    state=st, return_state=True, interpret=True)
    _, c3 = generate_fast_fused(params, cfg, k, 15, None, temperature=0.0,
                                state=st, interpret=True)
    chunked = np.concatenate([np.asarray(c) for c in (c1, c2, c3)], axis=1)
    np.testing.assert_array_equal(chunked, np.asarray(c_all))
    assert int(st.t) == rf - 1 + 45


def test_fused_conditioned_matches_xla():
    """Local conditioning (vocoder): fused kernel == XLA path at temp 0.
    The kernel applies cond as DMA-prefetched pre-projected adds; the XLA
    path as per-step matmuls — argmax rollouts must still agree exactly."""
    cfg = wt.get_config("tiny", cond_channels=5)
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    rf = cfg.receptive_field
    prime = jax.random.randint(jax.random.PRNGKey(30), (2, rf), 0, cfg.classes)
    n = 40
    total = rf - 1 + n
    cond = 0.5 * jax.random.normal(jax.random.PRNGKey(31), (2, total, 5))
    k = jax.random.PRNGKey(32)
    _, cf = generate_fast_fused(params, cfg, k, n, prime, temperature=0.0,
                                cond=cond, interpret=True)
    _, cx = wt.generate_fast(params, cfg, k, n, prime, temperature=0.0,
                             cond=cond)
    np.testing.assert_array_equal(np.asarray(cf), np.asarray(cx))
    # and the conditioning actually mattered
    _, cu = generate_fast_fused(params, cfg, k, n, prime, temperature=0.0,
                                interpret=True)
    assert not np.array_equal(np.asarray(cf), np.asarray(cu))


def test_fused_global_cond_matches_xla():
    """Global (speaker) conditioning, alone and combined with local."""
    cfg = wt.get_config("tiny", cond_channels=3, gcond_channels=4)
    params = wt.init_wavenet(jax.random.PRNGKey(1), cfg)
    rf = cfg.receptive_field
    prime = jax.random.randint(jax.random.PRNGKey(33), (2, rf), 0, cfg.classes)
    n = 24
    g = jax.random.normal(jax.random.PRNGKey(34), (2, 4))
    cond = 0.5 * jax.random.normal(jax.random.PRNGKey(35), (2, rf - 1 + n, 3))
    k = jax.random.PRNGKey(36)
    _, cf = generate_fast_fused(params, cfg, k, n, prime, temperature=0.0,
                                global_cond=g, interpret=True)
    _, cx = wt.generate_fast(params, cfg, k, n, prime, temperature=0.0,
                             global_cond=g)
    np.testing.assert_array_equal(np.asarray(cf), np.asarray(cx))
    _, bf = generate_fast_fused(params, cfg, k, n, prime, temperature=0.0,
                                cond=cond, global_cond=g, interpret=True)
    _, bx = wt.generate_fast(params, cfg, k, n, prime, temperature=0.0,
                             cond=cond, global_cond=g)
    np.testing.assert_array_equal(np.asarray(bf), np.asarray(bx))
    assert not np.array_equal(np.asarray(bf), np.asarray(cf))


def test_fused_conditioned_streaming_bitwise():
    """Chunked conditioned rollout (cond rows sliced per chunk) equals the
    single shot bitwise — the streaming vocoder serving pattern."""
    cfg = wt.get_config("tiny", cond_channels=4)
    params = wt.init_wavenet(jax.random.PRNGKey(2), cfg)
    rf = cfg.receptive_field
    prime = jax.random.randint(jax.random.PRNGKey(40), (1, rf), 0, cfg.classes)
    n1, n2 = 30, 20
    total = rf - 1 + n1 + n2
    cond = jax.random.normal(jax.random.PRNGKey(41), (1, total, 4))
    k = jax.random.PRNGKey(42)
    _, c_all = generate_fast_fused(params, cfg, k, n1 + n2, prime,
                                   temperature=0.0, cond=cond, interpret=True)
    t1 = rf - 1 + n1
    _, c1, st = generate_fast_fused(params, cfg, k, n1, prime,
                                    temperature=0.0, cond=cond[:, :t1],
                                    return_state=True, interpret=True)
    _, c2 = generate_fast_fused(params, cfg, k, n2, None, temperature=0.0,
                                cond=cond[:, t1:], state=st, interpret=True)
    chunked = np.concatenate([np.asarray(c1), np.asarray(c2)], axis=1)
    np.testing.assert_array_equal(chunked, np.asarray(c_all))


def test_synthesize_on_fused_backend():
    """synthesize() drives the VMEM kernel directly (backend hook)."""
    from functools import partial

    cfg = wt.get_config("tiny", cond_channels=6)
    params = wt.init_wavenet(jax.random.PRNGKey(3), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(50), (2, 4, 6))
    k = jax.random.PRNGKey(51)
    _, cls_f = wt.synthesize(
        params, cfg, k, mel, 8, temperature=0.0,
        backend=partial(generate_fast_fused, interpret=True),
    )
    _, cls_x = wt.synthesize(params, cfg, k, mel, 8, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(cls_f), np.asarray(cls_x))


def test_fuse_res_near_parity(tiny):
    """fuse_res pre-multiplies w_res[l] @ w_cur[l+1]: mathematically the
    same rollout, floating-point-reassociated — argmax classes agree on
    (nearly) every step, and conditioning composes with it."""
    cfg, params = tiny
    prime = jax.random.randint(
        jax.random.PRNGKey(2), (1, cfg.receptive_field), 0, cfg.classes
    )
    k = jax.random.PRNGKey(3)
    _, ce = generate_fast_fused(params, cfg, k, 48, prime, temperature=0.0,
                                interpret=True)
    _, cf = generate_fast_fused(params, cfg, k, 48, prime, temperature=0.0,
                                fuse_res=True, interpret=True)
    assert (np.asarray(ce) == np.asarray(cf)).mean() >= 0.9

    cfgc = wt.get_config("tiny", cond_channels=6)
    pc = wt.init_wavenet(jax.random.PRNGKey(1), cfgc)
    n = 24
    rf = cfgc.receptive_field
    primec = jax.random.randint(jax.random.PRNGKey(5), (1, rf), 0, cfgc.classes)
    cond = 0.5 * jax.random.normal(jax.random.PRNGKey(6), (1, rf - 1 + n, 6))
    _, cce = generate_fast_fused(pc, cfgc, k, n, primec, temperature=0.0,
                                 cond=cond, interpret=True)
    _, ccf = generate_fast_fused(pc, cfgc, k, n, primec, temperature=0.0,
                                 cond=cond, fuse_res=True, interpret=True)
    assert (np.asarray(cce) == np.asarray(ccf)).mean() >= 0.9
