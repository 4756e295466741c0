"""Speculative decoding (models/speculative.py) and the multi-position
window step (models/generate.py gen_step_window / commit_window)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_wavenet_tpu as wt
from pytorch_wavenet_tpu.models.generate import (
    commit_window,
    gen_step,
    gen_step_window,
    init_gen_state,
)
from pytorch_wavenet_tpu.models.speculative import speculative_generate


@pytest.fixture(scope="module")
def tiny():
    cfg = wt.get_config("tiny")
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _sequential(params, cfg, state, window):
    """Oracle: consume the window one gen_step at a time."""
    logits = []
    for i in range(window.shape[1]):
        lg, state = gen_step(params, cfg, state, window[:, i])
        logits.append(lg)
    return jnp.stack(logits, axis=1), state


@pytest.mark.parametrize("win", [1, 3, 8, 20])
def test_window_equals_sequential(tiny, win):
    """One window pass == win chained gen_steps: logits and committed ring
    state (windows longer than every ring period included)."""
    cfg, params = tiny
    state = init_gen_state(cfg, 2)
    # roll some history in first so rings are non-trivial
    hist = jax.random.randint(jax.random.PRNGKey(1), (2, 5), 0, cfg.classes)
    _, state = _sequential(params, cfg, state, hist)
    window = jax.random.randint(jax.random.PRNGKey(2), (2, win), 0,
                                cfg.classes)
    want_logits, want_state = _sequential(params, cfg, state, window)
    got_logits, pend = gen_step_window(params, cfg, state, window)
    got_state = commit_window(state, pend, win)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(want_logits), atol=2e-5)
    assert int(got_state.t) == int(want_state.t)
    for a, b in zip(got_state.buffers, want_state.buffers):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_window_from_empty_state(tiny):
    """Zero history: window reads the zero-filled rings exactly like
    gen_step does."""
    cfg, params = tiny
    state = init_gen_state(cfg, 1)
    window = jax.random.randint(jax.random.PRNGKey(3), (1, 6), 0,
                                cfg.classes)
    want_logits, want_state = _sequential(params, cfg, state, window)
    got_logits, pend = gen_step_window(params, cfg, state, window)
    got_state = commit_window(state, pend, 6)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(want_logits), atol=2e-5)
    for a, b in zip(got_state.buffers, want_state.buffers):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_partial_commit(tiny):
    """commit_window(valid=v) == consuming only the first v inputs."""
    cfg, params = tiny
    state = init_gen_state(cfg, 1)
    window = jax.random.randint(jax.random.PRNGKey(4), (1, 8), 0,
                                cfg.classes)
    v = 3
    _, pend = gen_step_window(params, cfg, state, window)
    got = commit_window(state, pend, v)
    _, want = _sequential(params, cfg, state, window[:, :v])
    assert int(got.t) == int(want.t) == v
    for a, b in zip(got.buffers, want.buffers):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    # and continuing from the partial commit matches the sequential path
    nxt = jax.random.randint(jax.random.PRNGKey(5), (1, 4), 0, cfg.classes)
    gl, _ = gen_step_window(params, cfg, got, nxt)
    wl, _ = _sequential(params, cfg, want, nxt)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(wl), atol=2e-5)


@pytest.mark.parametrize("k", [1, 4, 7])
def test_speculative_equals_fast_path(tiny, k):
    """Exactness: with an unrelated random draft, the emitted classes are
    the teacher's argmax rollout — draft quality cannot change audio."""
    cfg, params = tiny
    dcfg = wt.get_config("tiny", layers=2, residual_channels=8,
                         dilation_channels=8, skip_channels=8)
    draft = wt.init_wavenet(jax.random.PRNGKey(7), dcfg)
    prime = jax.random.randint(jax.random.PRNGKey(8),
                               (1, cfg.receptive_field), 0, cfg.classes)
    n = 25
    key = jax.random.PRNGKey(9)
    _, cls_spec, rate = speculative_generate(params, cfg, draft, dcfg, key,
                                             n, prime, k=k)
    _, cls_fast = wt.generate_fast(params, cfg, key, n, prime,
                                   temperature=0.0)
    np.testing.assert_array_equal(np.asarray(cls_spec), np.asarray(cls_fast))
    assert 1.0 <= float(rate) <= k


def test_speculative_perfect_draft_accepts_k(tiny):
    """Draft == teacher: every proposal matches, so each verify pass emits
    k samples (the accept-rate ceiling)."""
    cfg, params = tiny
    prime = jax.random.randint(jax.random.PRNGKey(10),
                               (1, cfg.receptive_field), 0, cfg.classes)
    k = 6
    _, cls_spec, rate = speculative_generate(
        params, cfg, params, cfg, jax.random.PRNGKey(11), 24, prime, k=k
    )
    _, cls_fast = wt.generate_fast(params, cfg, jax.random.PRNGKey(11), 24,
                                   prime, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(cls_spec), np.asarray(cls_fast))
    assert float(rate) == pytest.approx(k, abs=1e-6)


def test_speculative_short_prime_and_validation(tiny):
    cfg, params = tiny
    dcfg = wt.get_config("tiny", layers=2)
    draft = wt.init_wavenet(jax.random.PRNGKey(12), dcfg)
    # default prime (mid-class, like generate_fast)
    _, cls_spec, _ = speculative_generate(params, cfg, draft, dcfg,
                                          jax.random.PRNGKey(13), 10, k=4)
    first = jnp.full((1, 1), cfg.classes // 2, jnp.int32)
    _, cls_fast = wt.generate_fast(params, cfg, jax.random.PRNGKey(13), 10,
                                   first, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(cls_spec), np.asarray(cls_fast))
    with pytest.raises(ValueError, match="single-stream"):
        speculative_generate(params, cfg, draft, dcfg,
                             jax.random.PRNGKey(0), 4,
                             jnp.zeros((2, 3), jnp.int32))
    with pytest.raises(ValueError, match="k must be"):
        speculative_generate(params, cfg, draft, dcfg,
                             jax.random.PRNGKey(0), 4, k=0)


def test_window_conditioned(tiny):
    """cond rows align per window position; global_cond broadcasts — both
    must reproduce the sequential conditioned steps."""
    cfg = wt.get_config("tiny", cond_channels=5, gcond_channels=3)
    params = wt.init_wavenet(jax.random.PRNGKey(20), cfg)
    state = init_gen_state(cfg, 2)
    win = 7
    window = jax.random.randint(jax.random.PRNGKey(21), (2, win), 0,
                                cfg.classes)
    cond = 0.4 * jax.random.normal(jax.random.PRNGKey(22), (2, win, 5))
    g = jax.random.normal(jax.random.PRNGKey(23), (2, 3))
    want = []
    st = state
    for i in range(win):
        lg, st = gen_step(params, cfg, st, window[:, i], cond=cond[:, i],
                          global_cond=g)
        want.append(lg)
    want = jnp.stack(want, axis=1)
    got, pend = gen_step_window(params, cfg, state, window, cond=cond,
                                global_cond=g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    got_state = commit_window(state, pend, win)
    for a, b in zip(got_state.buffers, st.buffers):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_window_prime_matches_regular(tiny):
    """window_prime: bulk prime ingestion gives the same argmax rollout as
    step-by-step priming (float-reassociated — near-tie flips allowed but
    must be rare)."""
    cfg, params = tiny
    rf = cfg.receptive_field
    prime = jax.random.randint(jax.random.PRNGKey(30), (2, rf + 200), 0,
                               cfg.classes)
    key = jax.random.PRNGKey(31)
    n = 40
    _, cls_a = wt.generate_fast(params, cfg, key, n, prime, temperature=0.0)
    _, cls_b = wt.generate_fast(params, cfg, key, n, prime, temperature=0.0,
                                window_prime=True)
    assert cls_b.shape == cls_a.shape
    assert (np.asarray(cls_a) == np.asarray(cls_b)).mean() >= 0.9
    # streaming continues from a window-primed state
    _, c1, st = wt.generate_fast(params, cfg, key, n, prime, temperature=0.0,
                                 window_prime=True, return_state=True)
    _, c2 = wt.generate_fast(params, cfg, key, 10, None, temperature=0.0,
                             state=st)
    assert c2.shape == (2, 10)
