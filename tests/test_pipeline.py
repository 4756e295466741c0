"""Cross-chip pipelined generation (parallel/pipeline.py): each stream
group must reproduce the single-device fast path exactly — the pipeline is
a scheduling transform, not a numerics change."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_wavenet_tpu as wt
from pytorch_wavenet_tpu.parallel.pipeline import (
    generate_pipelined,
    make_pipeline_mesh,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = wt.get_config("tiny")  # 3 layers x 2 blocks = 6 layers
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _reference_rollout(params, cfg, key, n, prime, n_groups, **kw):
    """What the pipeline must produce: per-group generate_fast under
    fold_in(key, g)."""
    outs = [
        wt.generate_fast(
            params, cfg, jax.random.fold_in(key, g), n,
            prime[g * (prime.shape[0] // n_groups):
                  (g + 1) * (prime.shape[0] // n_groups)],
            **kw,
        )[1]
        for g in range(n_groups)
    ]
    return np.concatenate([np.asarray(o) for o in outs], axis=0)


@pytest.mark.parametrize("n_stages", [2, 3])
def test_pipeline_matches_fast_path(tiny, n_stages):
    cfg, params = tiny
    mesh = make_pipeline_mesh(n_stages)
    rf = cfg.receptive_field
    S = 2 * n_stages  # 2 streams per group
    prime = jax.random.randint(jax.random.PRNGKey(7), (S, rf), 0, cfg.classes)
    key = jax.random.PRNGKey(8)
    n = 20
    _, cls = generate_pipelined(params, cfg, mesh, key, n, prime,
                                temperature=0.0)
    expect = _reference_rollout(params, cfg, key, n, prime, n_stages,
                                temperature=0.0)
    np.testing.assert_array_equal(np.asarray(cls), expect)


def test_pipeline_sampled_parity(tiny):
    """temperature > 0: the pipeline pre-draws each group's uniforms with
    the same fold_in(key, g) stream generate_fast uses, so even sampled
    rollouts agree."""
    cfg, params = tiny
    mesh = make_pipeline_mesh(2)
    rf = cfg.receptive_field
    prime = jax.random.randint(jax.random.PRNGKey(9), (2, rf), 0, cfg.classes)
    key = jax.random.PRNGKey(10)
    n = 16
    _, cls = generate_pipelined(params, cfg, mesh, key, n, prime,
                                temperature=1.0, regularize=0.01)
    expect = _reference_rollout(params, cfg, key, n, prime, 2,
                                temperature=1.0, regularize=0.01)
    np.testing.assert_array_equal(np.asarray(cls), expect)


def test_pipeline_global_cond(tiny):
    cfg = wt.get_config("tiny", gcond_channels=4)
    params = wt.init_wavenet(jax.random.PRNGKey(1), cfg)
    mesh = make_pipeline_mesh(2)
    rf = cfg.receptive_field
    S = 4
    prime = jax.random.randint(jax.random.PRNGKey(11), (S, rf), 0,
                               cfg.classes)
    g = jax.random.normal(jax.random.PRNGKey(12), (S, 4))
    key = jax.random.PRNGKey(13)
    n = 12
    _, cls = generate_pipelined(params, cfg, mesh, key, n, prime,
                                temperature=0.0, global_cond=g)
    outs = [
        np.asarray(wt.generate_fast(
            params, cfg, jax.random.fold_in(key, gi), n, prime[2 * gi:2 * gi + 2],
            temperature=0.0, global_cond=g[2 * gi:2 * gi + 2],
        )[1])
        for gi in range(2)
    ]
    np.testing.assert_array_equal(np.asarray(cls), np.concatenate(outs))
    # conditioning mattered
    _, cls_u = generate_pipelined(params, cfg, mesh, key, n, prime,
                                  temperature=0.0)
    assert not np.array_equal(np.asarray(cls), np.asarray(cls_u))


def test_pipeline_short_prime_and_default(tiny):
    """num_given=1 default prime and short primes flow through the same
    prime-then-feedback input switch."""
    cfg, params = tiny
    mesh = make_pipeline_mesh(2)
    key = jax.random.PRNGKey(14)
    _, cls = generate_pipelined(params, cfg, mesh, key, 8, temperature=0.0)
    assert cls.shape == (2, 8)
    prime = jax.random.randint(jax.random.PRNGKey(15), (2, 3), 0, cfg.classes)
    _, cls2 = generate_pipelined(params, cfg, mesh, key, 8, prime,
                                 temperature=0.0)
    expect = _reference_rollout(params, cfg, key, 8, prime, 2,
                                temperature=0.0)
    np.testing.assert_array_equal(np.asarray(cls2), expect)


def test_pipeline_validation(tiny):
    cfg, params = tiny
    mesh = make_pipeline_mesh(4)  # 6 layers % 4 != 0
    with pytest.raises(ValueError, match="stages"):
        generate_pipelined(params, cfg, mesh, jax.random.PRNGKey(0), 4)
    mesh2 = make_pipeline_mesh(2)
    bad_prime = jnp.zeros((3, 5), jnp.int32)  # 3 streams % 2 groups
    with pytest.raises(ValueError, match="groups"):
        generate_pipelined(params, cfg, mesh2, jax.random.PRNGKey(0), 4,
                           bad_prime)
    with pytest.raises(ValueError, match="gcond"):
        generate_pipelined(params, cfg, mesh2, jax.random.PRNGKey(0), 4,
                           global_cond=jnp.zeros((2, 4)))
