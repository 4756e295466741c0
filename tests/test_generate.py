"""Generation equivalence and sampling tests.

The reference keeps the slow path as the implicit oracle for the fast path
(same weights, same trunk — reference: wavenet_model.py:198-315); here that
becomes an explicit property: fast == naive == teacher-forced trunk.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_wavenet_tpu as wt
from pytorch_wavenet_tpu.models.generate import (
    init_gen_state,
    gen_step,
    buffer_length,
    _sample,
)
from pytorch_wavenet_tpu.ops.mulaw import mu_law_expansion


@pytest.fixture(scope="module")
def tiny():
    cfg = wt.get_config("tiny")
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _prime(cfg, n_streams, key=jax.random.PRNGKey(2)):
    return jax.random.randint(key, (n_streams, cfg.receptive_field), 0, cfg.classes)


def test_fast_equals_naive_argmax(tiny):
    cfg, params = tiny
    prime = _prime(cfg, 4)
    k = jax.random.PRNGKey(3)
    _, cf = wt.generate_fast(params, cfg, k, 64, prime, temperature=0.0)
    _, cn = wt.generate(params, cfg, k, 64, prime, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(cf), np.asarray(cn))


def test_fast_equals_teacher_forced(tiny):
    """The fast path's per-step argmax must equal teacher-forcing the
    generated sequence through the training trunk — queue state is exactly
    the trunk's activation history."""
    cfg, params = tiny
    rf = cfg.receptive_field
    prime = _prime(cfg, 2)
    n = 32
    _, cls = wt.generate_fast(
        params, cfg, jax.random.PRNGKey(3), n, prime, temperature=0.0
    )
    cls = np.asarray(cls)  # (2, n)
    full = np.concatenate([np.asarray(prime), cls[:, :-1]], axis=1)  # (2, rf+n-1)
    logits = wt.wavenet_logits(params, cfg, jnp.asarray(full), out_len=n)
    tf_argmax = np.asarray(jnp.argmax(logits, axis=-1))
    np.testing.assert_array_equal(tf_argmax, cls)


def test_fast_generation_deterministic_at_t0(tiny):
    cfg, params = tiny
    prime = _prime(cfg, 1)
    _, a = wt.generate_fast(params, cfg, jax.random.PRNGKey(1), 32, prime, temperature=0.0)
    _, b = wt.generate_fast(params, cfg, jax.random.PRNGKey(9), 32, prime, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_default_prime_is_mid_class(tiny):
    """reference: wavenet_model.py:245-247 — default prime is one mid-class
    sample."""
    cfg, params = tiny
    wav, cls = wt.generate_fast(params, cfg, jax.random.PRNGKey(0), 8)
    assert cls.shape == (1, 8)
    explicit = jnp.full((1, 1), cfg.classes // 2, jnp.int32)
    _, cls2 = wt.generate_fast(params, cfg, jax.random.PRNGKey(0), 8, explicit)
    np.testing.assert_array_equal(np.asarray(cls), np.asarray(cls2))


def test_waveform_is_mu_law_expanded(tiny):
    cfg, params = tiny
    wav, cls = wt.generate_fast(params, cfg, jax.random.PRNGKey(5), 16, _prime(cfg, 1))
    # decode matches the reference's (x/classes)*2-1 -> expansion
    # (reference: wavenet_model.py:296,314)
    x = (np.asarray(cls, np.float64) / cfg.classes) * 2.0 - 1.0
    np.testing.assert_allclose(np.asarray(wav), mu_law_expansion(x, cfg.classes), atol=1e-5)


def test_gen_state_ring_buffer_shapes(tiny):
    cfg, params = tiny
    st = init_gen_state(cfg, 3)
    assert len(st.buffers) == cfg.num_layers
    for l, buf in enumerate(st.buffers):
        # exactly the reference's per-queue max_length
        # (reference: wavenet_model.py:78)
        assert buf.shape == (
            3, (cfg.kernel_size - 1) * cfg.dilations[l] + 1,
            cfg.residual_channels,
        )
    assert buffer_length(cfg) == (cfg.kernel_size - 1) * cfg.max_dilation + 1
    logits, st2 = gen_step(params, cfg, st, jnp.zeros((3,), jnp.int32))
    assert logits.shape == (3, cfg.classes)
    assert int(st2.t) == 1
    # exactly one slot per layer/stream was written
    for b0, b1 in zip(st.buffers, st2.buffers):
        changed = np.asarray((b0 != b1).any(axis=-1)).sum(axis=-1)
        assert (changed <= 1).all()


def test_queue_wraparound_long_rollout(tiny):
    """Roll out longer than the ring buffer so every slot is overwritten at
    least once (the reference's wraparound concat path,
    wavenet_modules.py:59-72) and the fast path still matches naive."""
    cfg, params = tiny
    n = buffer_length(cfg) * 2 + 5
    prime = _prime(cfg, 1)
    k = jax.random.PRNGKey(7)
    _, cf = wt.generate_fast(params, cfg, k, n, prime, temperature=0.0)
    _, cn = wt.generate(params, cfg, k, n, prime, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(cf), np.asarray(cn))


def test_sampling_matches_softmax_distribution():
    """Inverse-CDF sampling reproduces softmax(logits/T) — the
    distribution-level parity SURVEY.md §7(c) requires (the reference samples
    via host numpy, wavenet_model.py:282-289)."""
    key = jax.random.PRNGKey(0)
    classes = 8
    logits = jnp.asarray([0.0, 1.0, 2.0, -1.0, 0.5, 0.0, -2.0, 1.5])
    n = 20000
    u = jax.random.uniform(key, (n,))
    samples = np.asarray(
        _sample(jnp.tile(logits, (n, 1)), u, classes, 1.0, 0.0)
    )
    probs = np.asarray(jax.nn.softmax(logits))
    freq = np.bincount(samples, minlength=classes) / n
    np.testing.assert_allclose(freq, probs, atol=0.015)


def test_temperature_effect():
    """Low temperature concentrates mass on the argmax class."""
    classes = 8
    logits = jnp.asarray([0.0, 3.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    u = jax.random.uniform(jax.random.PRNGKey(1), (5000,))
    hot = np.asarray(_sample(jnp.tile(logits, (5000, 1)), u, classes, 0.1, 0.0))
    assert (hot == 1).mean() > 0.99


def test_per_stream_temperature_array(tiny):
    """temperature as a (S,) array: a temp-0 stream is bitwise the scalar
    temperature-0 rollout even with hot neighbors; generate_audio stacks
    all temperatures from one batched rollout."""
    cfg, params = tiny
    rf = cfg.receptive_field
    prime = jax.random.randint(jax.random.PRNGKey(30), (3, rf), 0, cfg.classes)
    k = jax.random.PRNGKey(31)
    n = 24
    _, cm = wt.generate_fast(params, cfg, k, n, prime,
                             temperature=jnp.asarray([0.0, 1.0, 0.6]))
    _, c0 = wt.generate_fast(params, cfg, k, n, prime, temperature=0.0)
    cm, c0 = np.asarray(cm), np.asarray(c0)
    np.testing.assert_array_equal(cm[0], c0[0])
    assert cm.min() >= 0 and cm.max() < cfg.classes
    assert (cm[1] != c0[1]).any()

    # streaming state composes with the array temperature
    _, c1, st = wt.generate_fast(params, cfg, k, 10, prime,
                                 temperature=jnp.asarray([0.0, 1.0, 0.6]),
                                 return_state=True)
    _, c2 = wt.generate_fast(params, cfg, k, n - 10,
                             temperature=jnp.asarray([0.0, 1.0, 0.6]),
                             state=st)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(c1), np.asarray(c2)], axis=1)[0], c0[0]
    )

    out = wt.generate_audio(params, cfg, length=12,
                            temperatures=(0.0, 0.9), seed=4)
    assert out.shape == (2, 12) and out.dtype == np.float32
    wav0, _ = wt.generate_fast(params, cfg, jax.random.PRNGKey(4), 12,
                               jnp.full((2, 1), cfg.classes // 2, jnp.int32),
                               temperature=jnp.asarray([0.0, 0.9]))
    np.testing.assert_array_equal(out[0], np.asarray(wav0)[0])


def test_regularizer_pulls_to_mid_class(tiny):
    """reference: wavenet_model.py:273-274,280 — quadratic regularizer
    penalizes classes far from classes/2."""
    classes = 16
    logits = jnp.zeros((1000, classes))
    u = jax.random.uniform(jax.random.PRNGKey(2), (1000,))
    reg = np.asarray(_sample(logits, u, classes, 1.0, 0.5))
    noreg = np.asarray(_sample(logits, u, classes, 1.0, 0.0))
    mid = classes / 2.0
    assert np.abs(reg - mid).mean() < np.abs(noreg - mid).mean()


def test_multi_stream_independence(tiny):
    """Streams are independent: generating (a,b) batched equals generating
    each alone (the reference can't do this at all — batch-1 only,
    wavenet_model.py:179)."""
    cfg, params = tiny
    prime = _prime(cfg, 2)
    k = jax.random.PRNGKey(11)
    _, both = wt.generate_fast(params, cfg, k, 24, prime, temperature=0.0)
    _, a = wt.generate_fast(params, cfg, k, 24, prime[:1], temperature=0.0)
    _, b = wt.generate_fast(params, cfg, k, 24, prime[1:], temperature=0.0)
    np.testing.assert_array_equal(np.asarray(both[0]), np.asarray(a[0]))
    np.testing.assert_array_equal(np.asarray(both[1]), np.asarray(b[0]))


def test_generate_short_prime_pads(tiny):
    """Naive generation left-pads short primes (reference capability at
    wavenet_model.py:203-210 — reproduced without the reference's bug)."""
    cfg, params = tiny
    short = jnp.full((1, 3), 5, jnp.int32)
    wav, cls = wt.generate(params, cfg, jax.random.PRNGKey(0), 8, short, temperature=0.0)
    assert cls.shape == (1, 8)
    assert np.isfinite(np.asarray(wav)).all()


def test_generate_long_matches_single_shot(tiny):
    """Chunked re-priming reconstructs the queue state exactly: a chunked
    argmax rollout equals the single-shot one."""
    from pytorch_wavenet_tpu.models.generate import generate_long

    cfg, params = tiny
    prime = _prime(cfg, 1)
    n = 70
    k = jax.random.PRNGKey(17)
    _, ref = wt.generate_fast(params, cfg, k, n, prime, temperature=0.0)
    progress = []
    _, out = generate_long(
        params, cfg, k, n, prime, temperature=0.0, chunk_size=cfg.receptive_field + 9,
        progress_callback=lambda d, t: progress.append((d, t)),
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert progress[-1] == (n, n)
    with pytest.raises(ValueError):
        generate_long(params, cfg, k, 8, prime, chunk_size=2)


def test_streaming_state_chunked_equals_single_shot(tiny):
    """Chunked generate_fast with StreamState flow-through is bitwise equal
    to one uninterrupted rollout at temperature 0 (VERDICT item 5)."""
    cfg, params = tiny
    rf = cfg.receptive_field
    prime = jax.random.randint(jax.random.PRNGKey(11), (2, rf), 0, cfg.classes)
    k = jax.random.PRNGKey(12)
    _, c_all = wt.generate_fast(params, cfg, k, 45, prime, temperature=0.0)
    _, c1, st = wt.generate_fast(params, cfg, k, 20, prime, temperature=0.0,
                                 return_state=True)
    _, c2, st = wt.generate_fast(params, cfg, k, 15, None, temperature=0.0,
                                 state=st, return_state=True)
    _, c3 = wt.generate_fast(params, cfg, k, 10, None, temperature=0.0,
                             state=st)
    chunked = np.concatenate([np.asarray(c) for c in (c1, c2, c3)], axis=1)
    np.testing.assert_array_equal(chunked, np.asarray(c_all))


def test_streaming_state_rejects_prime_and_state(tiny):
    cfg, params = tiny
    _, _, st = wt.generate_fast(params, cfg, jax.random.PRNGKey(0), 4,
                                temperature=0.0, return_state=True)
    with pytest.raises(ValueError, match="not both"):
        wt.generate_fast(params, cfg, jax.random.PRNGKey(0), 4,
                         jnp.zeros((1, 1), jnp.int32), state=st)


def test_generate_long_streaming_bitwise(tiny):
    """generate_long's default streaming mode has zero chunk-boundary
    error; the re-prime fallback also matches (exact-history re-prime)."""
    cfg, params = tiny
    rf = cfg.receptive_field
    prime = jax.random.randint(jax.random.PRNGKey(13), (1, rf), 0, cfg.classes)
    k = jax.random.PRNGKey(14)
    _, c_one = wt.generate_fast(params, cfg, k, 60, prime, temperature=0.0)
    _, c_str = wt.generate_long(params, cfg, k, 60, prime, temperature=0.0,
                                chunk_size=rf + 9)
    np.testing.assert_array_equal(np.asarray(c_str), np.asarray(c_one))
    _, c_rep = wt.generate_long(params, cfg, k, 60, prime, temperature=0.0,
                                chunk_size=rf + 9, streaming=False)
    np.testing.assert_array_equal(np.asarray(c_rep), np.asarray(c_one))


def test_generate_fast_progress_callback(tiny):
    """Single-shot generate_fast now has the reference's progress hook
    (reference: wavenet_model.py:308-311); the chunking it induces is
    bitwise-free at temperature 0."""
    cfg, params = tiny
    rf = cfg.receptive_field
    prime = jax.random.randint(jax.random.PRNGKey(15), (1, rf), 0, cfg.classes)
    k = jax.random.PRNGKey(16)
    calls = []
    _, c_cb = wt.generate_fast(
        params, cfg, k, 50, prime, temperature=0.0,
        progress_callback=lambda done, total: calls.append((done, total)),
        progress_interval=20,
    )
    assert calls == [(20, 50), (40, 50), (50, 50)]
    _, c_plain = wt.generate_fast(params, cfg, k, 50, prime, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(c_cb), np.asarray(c_plain))
