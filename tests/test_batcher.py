"""Continuous batching (serving/batcher.py), interpret mode on CPU.

The exactness contract: a request's output is bitwise identical (at
temperature 0) to a solo rollout of the same prime, regardless of WHEN the
request joins the shared rollout — admission re-bases the primed ring
state onto the batcher's global clock."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_wavenet_tpu as wt
from pytorch_wavenet_tpu.serving import ContinuousBatcher


@pytest.fixture(scope="module")
def tiny():
    cfg = wt.get_config("tiny")
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _solo(params, cfg, prime, n):
    _, cls = wt.generate_fast(params, cfg, jax.random.PRNGKey(9), n,
                              jnp.asarray(prime)[None, :], temperature=0.0)
    return np.asarray(cls)[0]


def _wait_for(handle, k, timeout=300.0):
    deadline = time.time() + timeout
    while sum(p.size for p in handle._parts) < k:
        if handle.done() or time.time() > deadline:
            break
        time.sleep(0.05)


def test_staggered_admission_matches_solo(tiny):
    """Three temperature-0 requests admitted at different global times all
    reproduce their solo rollouts bitwise."""
    cfg, params = tiny
    rf = cfg.receptive_field
    primes = [
        np.asarray(jax.random.randint(jax.random.fold_in(
            jax.random.PRNGKey(1), i), (rf,), 0, cfg.classes))
        for i in range(3)
    ]
    b = ContinuousBatcher(params, cfg, lanes=3, chunk=6, interpret=True)
    try:
        h0 = b.submit(primes[0], 25, temperature=0.0)
        _wait_for(h0, 7)  # a chunk or two in flight before the next joins
        h1 = b.submit(primes[1], 18, temperature=0.0)
        _wait_for(h1, 1)
        h2 = b.submit(primes[2], 11, temperature=0.0)
        for h, prime, n in ((h0, primes[0], 25), (h1, primes[1], 18),
                            (h2, primes[2], 11)):
            wav, cls = h.result(timeout=300)
            np.testing.assert_array_equal(cls, _solo(params, cfg, prime, n))
            assert wav.shape == (n,) and wav.dtype == np.float32
    finally:
        b.close()


def test_lane_reuse_and_mixed_temperature(tiny):
    """More requests than lanes: lanes recycle; hot-temperature requests
    share the rollout with greedy ones without disturbing them."""
    cfg, params = tiny
    rf = cfg.receptive_field
    prime = np.asarray(jax.random.randint(
        jax.random.PRNGKey(2), (rf,), 0, cfg.classes))
    b = ContinuousBatcher(params, cfg, lanes=2, chunk=5, interpret=True)
    try:
        cold = b.submit(prime, 15, temperature=0.0)
        hot = b.submit(prime, 15, temperature=1.2)
        extra = b.submit(prime, 8, temperature=0.0)  # waits for a free lane
        _, cls_cold = cold.result(timeout=300)
        _, cls_hot = hot.result(timeout=300)
        _, cls_extra = extra.result(timeout=300)
        solo = _solo(params, cfg, prime, 15)
        np.testing.assert_array_equal(cls_cold, solo)
        np.testing.assert_array_equal(cls_extra, solo[:8])
        assert cls_hot.min() >= 0 and cls_hot.max() < cfg.classes
        assert (cls_hot != solo).any()
    finally:
        b.close()


def test_burst_admission_matches_solo(tiny):
    """A burst of equal-length requests (grouped into one prime call when
    lanes allow) each reproduces its solo rollout."""
    cfg, params = tiny
    rf = cfg.receptive_field
    primes = [
        np.asarray(jax.random.randint(jax.random.fold_in(
            jax.random.PRNGKey(3), i), (rf,), 0, cfg.classes))
        for i in range(3)
    ]
    b = ContinuousBatcher(params, cfg, lanes=4, chunk=7, interpret=True)
    try:
        handles = [b.submit(p, 13, temperature=0.0) for p in primes]
        for h, p in zip(handles, primes):
            _, cls = h.result(timeout=300)
            np.testing.assert_array_equal(cls, _solo(params, cfg, p, 13))
    finally:
        b.close()


def test_on_chunk_streaming_and_close(tiny):
    cfg, params = tiny
    chunks = []
    b = ContinuousBatcher(params, cfg, lanes=2, chunk=4, interpret=True)
    try:
        h = b.submit(np.asarray([cfg.classes // 2]), 10, temperature=0.0,
                     on_chunk=chunks.append)
        h.result(timeout=300)
        assert sum(c.size for c in chunks) >= 10
    finally:
        b.close()
    with pytest.raises(RuntimeError):
        b.submit(np.asarray([1]), 4)


def test_conditioned_requests_share_the_pool():
    """Mel-conditioned (vocoder) requests: each lane carries its own
    conditioning timeline; a conditioned temp-0 request admitted into a
    busy pool equals its solo conditioned rollout bitwise, and an
    unconditioned request rides zero rows unaffected."""
    cfg = wt.get_config("tiny_vocoder")
    params = wt.init_wavenet(jax.random.PRNGKey(20), cfg)
    rf = cfg.receptive_field
    M = cfg.cond_channels
    prime = np.asarray(jax.random.randint(
        jax.random.PRNGKey(21), (rf,), 0, cfg.classes))
    n1, n2 = 17, 9
    cond1 = np.asarray(0.5 * jax.random.normal(
        jax.random.PRNGKey(22), (rf - 1 + n1, M)), np.float32)
    cond2 = np.asarray(0.5 * jax.random.normal(
        jax.random.PRNGKey(23), (rf - 1 + n2, M)), np.float32)

    def solo(cond, n):
        _, cls = wt.generate_fast(
            params, cfg, jax.random.PRNGKey(9), n,
            jnp.asarray(prime)[None, :], temperature=0.0,
            cond=jnp.asarray(cond)[None])
        return np.asarray(cls)[0]

    b = ContinuousBatcher(params, cfg, lanes=3, chunk=6, interpret=True)
    try:
        plain = b.submit(prime, 20, temperature=0.0)  # unconditioned lane
        h1 = b.submit(prime, n1, temperature=0.0, cond=cond1)
        _wait_for(h1, 8)
        h2 = b.submit(prime, n2, temperature=0.0, cond=cond2)  # mid-flight
        _, c1 = h1.result(timeout=300)
        _, c2 = h2.result(timeout=300)
        _, cp = plain.result(timeout=300)
        np.testing.assert_array_equal(c1, solo(cond1, n1))
        np.testing.assert_array_equal(c2, solo(cond2, n2))
        np.testing.assert_array_equal(cp, _solo(params, cfg, prime, 20))
    finally:
        b.close()


def test_cond_shape_rejected(tiny):
    cfg, params = tiny  # tiny has cond_channels == 0
    b = ContinuousBatcher(params, cfg, lanes=2, chunk=4, interpret=True)
    try:
        with pytest.raises(ValueError, match="cond_channels"):
            b.submit(np.asarray([1]), 4, cond=np.zeros((4, 8), np.float32))
    finally:
        b.close()
    cfgv = wt.get_config("tiny_vocoder")
    pv = wt.init_wavenet(jax.random.PRNGKey(0), cfgv)
    b = ContinuousBatcher(pv, cfgv, lanes=2, chunk=4, interpret=True)
    try:
        with pytest.raises(ValueError, match="cond shape"):
            b.submit(np.asarray([1]), 4,
                     cond=np.zeros((3, cfgv.cond_channels), np.float32))
    finally:
        b.close()


def test_frames_mode_matches_solo():
    """Frames-on-the-wire conditioning (pool cond_hop): a temp-0 request
    submitting mel FRAMES equals the solo rollout whose cond is the same
    frames expanded over the full timeline — the pool's per-chunk device
    expansion is bitwise chunk-invariant (ops/mel.py), so admission time
    and chunking never change a response."""
    from pytorch_wavenet_tpu.ops.mel import expand_frames_window

    cfg = wt.get_config("tiny_vocoder")
    params = wt.init_wavenet(jax.random.PRNGKey(30), cfg)
    rf, M, hop = cfg.receptive_field, cfg.cond_channels, 4
    prime = np.asarray(jax.random.randint(
        jax.random.PRNGKey(31), (rf,), 0, cfg.classes))
    n1, n2 = 17, 9

    def mk_frames(seed, n):
        F = -(-(rf - 1 + n) // hop) + 2
        return np.asarray(0.5 * jax.random.normal(
            jax.random.PRNGKey(seed), (F, M)), np.float32)

    f1, f2 = mk_frames(32, n1), mk_frames(33, n2)

    def solo(frames, n):
        from pytorch_wavenet_tpu.ops.mel import frames_window_len

        total = rf - 1 + n
        Fs = frames.shape[0]
        need = frames_window_len(total, hop)
        idx = np.minimum(np.arange(max(Fs, need)), Fs - 1)
        rows = expand_frames_window(
            None, jnp.asarray(frames[idx])[None], hop,
            jnp.zeros(1, jnp.int32), total)
        _, cls = wt.generate_fast(
            params, cfg, jax.random.PRNGKey(9), n,
            jnp.asarray(prime)[None, :], temperature=0.0, cond=rows)
        return np.asarray(cls)[0]

    b = ContinuousBatcher(params, cfg, lanes=3, chunk=6, interpret=True,
                          cond_hop=hop)
    try:
        plain = b.submit(prime, 20, temperature=0.0)  # unconditioned lane
        h1 = b.submit(prime, n1, temperature=0.0, cond_frames=f1)
        _wait_for(h1, 8)
        h2 = b.submit(prime, n2, temperature=0.0, cond_frames=f2)
        _, c1 = h1.result(timeout=300)
        _, c2 = h2.result(timeout=300)
        _, cp = plain.result(timeout=300)
        np.testing.assert_array_equal(c1, solo(f1, n1))
        np.testing.assert_array_equal(c2, solo(f2, n2))
        np.testing.assert_array_equal(cp, _solo(params, cfg, prime, 20))
    finally:
        b.close()


def test_frames_mode_rejections():
    cfgv = wt.get_config("tiny_vocoder")
    pv = wt.init_wavenet(jax.random.PRNGKey(0), cfgv)
    b = ContinuousBatcher(pv, cfgv, lanes=2, chunk=4, interpret=True,
                          cond_hop=4)
    try:
        with pytest.raises(ValueError, match="cond_frames"):
            b.submit(np.asarray([1]), 4,
                     cond=np.zeros((4, cfgv.cond_channels), np.float32))
        with pytest.raises(ValueError, match="cond_frames shape"):
            b.submit(np.asarray([1]), 9,  # needs ceil(9/4)=3 frames
                     cond_frames=np.zeros((2, cfgv.cond_channels),
                                          np.float32))
    finally:
        b.close()
    b = ContinuousBatcher(pv, cfgv, lanes=2, chunk=4, interpret=True)
    try:
        with pytest.raises(ValueError, match="cond_hop"):
            b.submit(np.asarray([1]), 4,
                     cond_frames=np.zeros((4, cfgv.cond_channels),
                                          np.float32))
    finally:
        b.close()
    cfg_plain = wt.get_config("tiny")
    with pytest.raises(ValueError, match="cond_channels"):
        ContinuousBatcher(wt.init_wavenet(jax.random.PRNGKey(0), cfg_plain),
                          cfg_plain, lanes=2, chunk=4, interpret=True,
                          cond_hop=4)


def test_bad_requests_rejected(tiny):
    cfg, params = tiny
    b = ContinuousBatcher(params, cfg, lanes=2, chunk=4, interpret=True)
    try:
        with pytest.raises(ValueError):
            b.submit(np.zeros((2, 3), np.int32), 4)
        with pytest.raises(ValueError):
            b.submit(np.asarray([1]), 0)
    finally:
        b.close()


def test_cancel_frees_the_lane(tiny):
    """cancel() drops a request at the next chunk boundary; its lane is
    reused by a later request and result() raises RequestCancelled."""
    from pytorch_wavenet_tpu.serving import RequestCancelled

    cfg, params = tiny
    prime = np.asarray([cfg.classes // 2])
    b = ContinuousBatcher(params, cfg, lanes=1, chunk=4, interpret=True)
    try:
        doomed = b.submit(prime, 10_000, temperature=0.0)
        _wait_for(doomed, 5)
        doomed.cancel()
        # the single lane must free up for this one to ever complete
        after = b.submit(prime, 8, temperature=0.0)
        _, cls = after.result(timeout=300)
        np.testing.assert_array_equal(cls, _solo(params, cfg, prime, 8))
        assert doomed.done() and doomed.cancelled()
        with pytest.raises(RequestCancelled):
            doomed.result(timeout=0)
    finally:
        b.close()


def test_raising_on_chunk_fails_only_that_request(tiny):
    """A caller's on_chunk callback raising must not kill the pool thread:
    that handle fails with the callback's error, neighbors complete."""
    cfg, params = tiny
    prime = np.asarray([cfg.classes // 2])
    b = ContinuousBatcher(params, cfg, lanes=2, chunk=4, interpret=True)
    try:
        def boom(_):
            raise ValueError("consumer exploded")

        bad = b.submit(prime, 12, temperature=0.0, on_chunk=boom)
        good = b.submit(prime, 12, temperature=0.0)
        with pytest.raises(ValueError, match="consumer exploded"):
            bad.result(timeout=300)
        _, cls = good.result(timeout=300)
        np.testing.assert_array_equal(cls, _solo(params, cfg, prime, 12))
        # the pool is still alive: a fresh request completes
        _, cls2 = b.submit(prime, 6, temperature=0.0).result(timeout=300)
        np.testing.assert_array_equal(cls2, _solo(params, cfg, prime, 6))
    finally:
        b.close()


def test_device_step_failure_fails_riders_and_pool_recovers(tiny, monkeypatch):
    """A kernel-call failure mid-rollout fails the riding handles (instead
    of hanging them forever) and the pool re-bootstraps for new work."""
    import pytorch_wavenet_tpu.serving.batcher as bm

    cfg, params = tiny
    prime = np.asarray([cfg.classes // 2])
    real = bm.generate_fast_batched
    state = {"fail": False, "failed": False}

    def flaky(*args, **kwargs):
        if state["fail"]:
            state["fail"] = False
            state["failed"] = True
            raise RuntimeError("synthetic device failure")
        return real(*args, **kwargs)

    monkeypatch.setattr(bm, "generate_fast_batched", flaky)
    b = ContinuousBatcher(params, cfg, lanes=2, chunk=4, interpret=True)
    try:
        h = b.submit(prime, 10_000, temperature=0.0)
        _wait_for(h, 5)
        state["fail"] = True  # next kernel call (prime or chunk) raises
        with pytest.raises(RuntimeError, match="synthetic device failure"):
            h.result(timeout=300)
        assert state["failed"]
        # pool recovered: a fresh request runs end-to-end
        _, cls = b.submit(prime, 8, temperature=0.0).result(timeout=300)
        np.testing.assert_array_equal(cls, _solo(params, cfg, prime, 8))
    finally:
        b.close()


def test_head_tiles_admission(tiny):
    """head_tiles pools must still admit solo requests: the prime call
    drops the tiling (its padded width can't satisfy streams % (128*G));
    chunk steps keep it. Exactness is unchanged."""
    cfg, params = tiny
    prime = np.asarray(jax.random.randint(
        jax.random.PRNGKey(4), (cfg.receptive_field,), 0, cfg.classes))
    b = ContinuousBatcher(params, cfg, lanes=4, chunk=6, interpret=True,
                          head_tiles=2)
    try:
        h = b.submit(prime, 13, temperature=0.0)
        _, cls = h.result(timeout=300)
        np.testing.assert_array_equal(cls, _solo(params, cfg, prime, 13))
    finally:
        b.close()
    with pytest.raises(ValueError, match="head_tiles"):
        ContinuousBatcher(params, cfg, lanes=3, chunk=6, interpret=True,
                          head_tiles=2)


def test_hot_requests_are_reproducible(tiny):
    """Per-request seeds: a temperature>0 request's rollout is bitwise
    identical to the same-seed solo kernel call, no matter when it is
    admitted or what shares the pool — and resubmission reproduces it."""
    from pytorch_wavenet_tpu.ops.pallas.gen_kernel_hbm import (
        generate_fast_batched,
    )

    cfg, params = tiny
    rf = cfg.receptive_field
    prime = np.asarray(jax.random.randint(
        jax.random.PRNGKey(6), (rf,), 0, cfg.classes))
    n = 21
    _, solo = generate_fast_batched(
        params, cfg, jax.random.PRNGKey(0), n, jnp.asarray(prime)[None],
        temperature=jnp.asarray([0.9]), lane_seed=jnp.asarray([1234]),
        interpret=True)
    solo = np.asarray(solo)[0]
    assert len(set(solo.tolist())) > 1  # sampling, not greedy

    b = ContinuousBatcher(params, cfg, lanes=3, chunk=6, interpret=True)
    try:
        noise = b.submit(prime, 40, temperature=1.3)  # pool traffic
        _wait_for(noise, 7)
        h = b.submit(prime, n, temperature=0.9, seed=1234)  # mid-flight
        _, cls = h.result(timeout=300)
        np.testing.assert_array_equal(cls, solo)
        # resubmitting reproduces exactly at a different admission time
        h2 = b.submit(prime, n, temperature=0.9, seed=1234)
        _, cls2 = h2.result(timeout=300)
        np.testing.assert_array_equal(cls2, solo)
        noise.result(timeout=300)
    finally:
        b.close()


def test_stats_counters(tiny):
    """stats() reflects pool shape, lifetime counters, and sample totals."""
    cfg, params = tiny
    rf = cfg.receptive_field
    prime = np.asarray(jax.random.randint(
        jax.random.PRNGKey(3), (rf,), 0, cfg.classes))
    b = ContinuousBatcher(params, cfg, lanes=3, chunk=6, interpret=True)
    try:
        s0 = b.stats()
        assert s0["lanes"] == 3 and s0["chunk"] == 6
        assert s0["admitted"] == s0["samples_out"] == 0

        h1 = b.submit(prime, 13, temperature=0.0)
        h2 = b.submit(prime, 5, temperature=0.0)
        h1.result(timeout=300)
        h2.result(timeout=300)

        hc = b.submit(prime, 10_000, temperature=0.0)
        _wait_for(hc, 1)
        hc.cancel()
        with pytest.raises(Exception):
            hc.result(timeout=300)

        deadline = time.time() + 60
        while b.stats()["cancelled"] < 1 and time.time() < deadline:
            time.sleep(0.05)
        s = b.stats()
        assert s["admitted"] == 3 and s["completed"] == 2
        assert s["cancelled"] == 1 and s["failed"] == 0
        # every delivered sample is counted (the cancelled request
        # delivered at least its admission sample)
        assert s["samples_out"] >= 13 + 5 + 1
        assert s["pool_steps"] >= 3 and s["prime_calls"] >= 1
        assert s["active"] == 0 and s["free"] == 3 and s["queued"] == 0
        assert s["pool_clock"] > 0
    finally:
        b.close()


def test_close_drain_finishes_accepted_work(tiny):
    """close(drain=True) refuses new submissions but completes every
    already-accepted request instead of abandoning it."""
    cfg, params = tiny
    prime = np.asarray([cfg.classes // 2], np.int32)
    b = ContinuousBatcher(params, cfg, lanes=2, chunk=6, interpret=True)
    h1 = b.submit(prime, 40, temperature=0.0)
    h2 = b.submit(prime, 25, temperature=0.7, seed=3)
    _wait_for(h1, 1)
    t = threading.Thread(target=b.close, kwargs=dict(drain=True))
    t.start()
    # the drain flag flips quickly; new submissions must be refused while
    # accepted ones still run to completion
    deadline = time.time() + 30
    while not b._draining and time.time() < deadline:
        time.sleep(0.01)
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(prime, 5)
    _, cls1 = h1.result(timeout=300)
    _, cls2 = h2.result(timeout=300)
    t.join(timeout=60)
    assert cls1.shape == (40,) and cls2.shape == (25,)
    s = b.stats()
    assert s["completed"] == 2 and s["failed"] == 0


def test_mesh_sharded_pool(tiny):
    """mesh=: the lane pool shards over 4 virtual chips; admissions and
    rollouts behave exactly as on one device — greedy requests equal their
    solo rollouts bitwise, and a seeded hot request equals the same-seed
    solo kernel call (per-request counters make sharding transparent)."""
    from pytorch_wavenet_tpu.ops.pallas.gen_kernel_hbm import (
        generate_fast_batched,
    )
    from pytorch_wavenet_tpu.parallel.mesh import make_mesh

    cfg, params = tiny
    rf = cfg.receptive_field
    primes = [
        np.asarray(jax.random.randint(jax.random.fold_in(
            jax.random.PRNGKey(44), i), (rf,), 0, cfg.classes))
        for i in range(3)
    ]
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    b = ContinuousBatcher(params, cfg, lanes=4, chunk=6, interpret=True,
                          mesh=mesh)
    try:
        h0 = b.submit(primes[0], 25, temperature=0.0)
        _wait_for(h0, 7)  # staggered: h1 joins a pool already mid-flight
        h1 = b.submit(primes[1], 17, temperature=0.0)
        h2 = b.submit(primes[2], 21, temperature=0.9, seed=77)
        for h, prime, n in ((h0, primes[0], 25), (h1, primes[1], 17)):
            _, cls = h.result(timeout=300)
            np.testing.assert_array_equal(cls, _solo(params, cfg, prime, n))
        _, hot = h2.result(timeout=300)
        _, solo_hot = generate_fast_batched(
            params, cfg, jax.random.PRNGKey(0), 21,
            jnp.asarray(primes[2])[None], temperature=jnp.asarray([0.9]),
            lane_seed=jnp.asarray([77]), interpret=True)
        np.testing.assert_array_equal(hot, np.asarray(solo_hot)[0])
        assert b.stats()["completed"] == 3
    finally:
        b.close()

    with pytest.raises(ValueError, match="divisible"):
        ContinuousBatcher(params, cfg, lanes=5, chunk=6, interpret=True,
                          mesh=mesh)


def test_mesh_sharded_pool_conditioned():
    """Conditioned lanes through the sharded pool: the per-lane cond slab
    shards over the data axis with the lanes; a conditioned request in a
    4-chip pool equals its solo conditioned rollout bitwise."""
    from pytorch_wavenet_tpu.parallel.mesh import make_mesh

    cfg = wt.get_config("tiny_vocoder")
    params = wt.init_wavenet(jax.random.PRNGKey(20), cfg)
    rf, M = cfg.receptive_field, cfg.cond_channels
    prime = np.asarray(jax.random.randint(
        jax.random.PRNGKey(25), (rf,), 0, cfg.classes))
    n = 15
    cond = np.asarray(0.5 * jax.random.normal(
        jax.random.PRNGKey(26), (rf - 1 + n, M)), np.float32)
    _, solo = wt.generate_fast(
        params, cfg, jax.random.PRNGKey(9), n, jnp.asarray(prime)[None],
        temperature=0.0, cond=jnp.asarray(cond)[None])

    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    b = ContinuousBatcher(params, cfg, lanes=4, chunk=6, interpret=True,
                          mesh=mesh)
    try:
        noise = b.submit(prime, 20, temperature=1.1)  # busy pool
        _wait_for(noise, 3)
        h = b.submit(prime, n, temperature=0.0, cond=cond)
        _, cls = h.result(timeout=300)
        np.testing.assert_array_equal(cls, np.asarray(solo)[0])
        noise.result(timeout=300)
    finally:
        b.close()


def test_drain_covers_in_admission_requests(tiny):
    """A request popped from the submit queue but still inside its (slow)
    admission prime call is in neither the queue nor a lane; drain must
    still wait for it (the outstanding counter, not the gauges)."""
    cfg, params = tiny
    rf = cfg.receptive_field
    prime = np.asarray(jax.random.randint(
        jax.random.PRNGKey(60), (rf,), 0, cfg.classes))
    b = ContinuousBatcher(params, cfg, lanes=2, chunk=6, interpret=True)
    h = b.submit(prime, 20, temperature=0.0)
    b.close(drain=True)  # immediately: admission prime is still running
    _, cls = h.result(timeout=1)
    np.testing.assert_array_equal(cls, _solo(params, cfg, prime, 20))
    assert b.stats()["completed"] == 1


def test_pool_regularize_matches_solo(tiny):
    """Pool-wide logit regularization (the reference's generate_fast
    knob) flows through admission and chunk steps."""
    cfg, params = tiny
    rf = cfg.receptive_field
    prime = np.asarray(jax.random.randint(
        jax.random.PRNGKey(70), (rf,), 0, cfg.classes))
    _, solo = wt.generate_fast(
        params, cfg, jax.random.PRNGKey(9), 18, jnp.asarray(prime)[None],
        temperature=0.0, regularize=0.1)
    b = ContinuousBatcher(params, cfg, lanes=2, chunk=6, interpret=True,
                          regularize=0.1)
    try:
        _, cls = b.submit(prime, 18, temperature=0.0).result(timeout=300)
        np.testing.assert_array_equal(cls, np.asarray(solo)[0])
    finally:
        b.close()


def test_update_params_rolling_swap(tiny):
    """update_params swaps weights at a chunk boundary without dropping
    streams; new requests roll out under the new weights."""
    cfg, params = tiny
    params2 = wt.init_wavenet(jax.random.PRNGKey(99), cfg)
    prime = np.asarray([cfg.classes // 2], np.int32)
    b = ContinuousBatcher(params, cfg, lanes=2, chunk=6, interpret=True)
    try:
        h = b.submit(prime, 12, temperature=0.0)
        h.result(timeout=300)
        b.update_params(params2)
        _, cls = b.submit(prime, 12, temperature=0.0).result(timeout=300)
        np.testing.assert_array_equal(cls, _solo(params2, cfg, prime, 12))
        with pytest.raises(ValueError, match="mismatch|config"):
            b.update_params(wt.init_wavenet(
                jax.random.PRNGKey(1), wt.get_config(
                    "tiny", residual_channels=4)))
    finally:
        b.close()


def test_max_pending_sheds_load(tiny):
    """Admission control: submits beyond max_pending raise PoolOverloaded
    instead of buffering unboundedly; draining the queue re-opens it."""
    from pytorch_wavenet_tpu.serving import PoolOverloaded

    cfg, params = tiny
    prime = np.asarray([cfg.classes // 2], np.int32)
    b = ContinuousBatcher(params, cfg, lanes=1, chunk=6, interpret=True,
                          max_pending=2)
    try:
        handles = []
        with pytest.raises(PoolOverloaded):
            for _ in range(12):  # 1 lane: the queue fills within a few
                handles.append(b.submit(prime, 30, temperature=0.0))
        assert handles  # accepted requests still complete exactly
        for h in handles:
            _, cls = h.result(timeout=300)
            np.testing.assert_array_equal(
                cls, _solo(params, cfg, prime, 30))
        # queue drained: admission re-opens
        b.submit(prime, 5, temperature=0.0).result(timeout=300)
    finally:
        b.close()


def test_kernel_size_3_pool(tiny):
    """The any-k tap walk holds through the pool: k=3 requests admitted
    mid-flight reproduce their solo rollouts bitwise."""
    cfg = wt.get_config("tiny", kernel_size=3)
    params = wt.init_wavenet(jax.random.PRNGKey(5), cfg)
    rf = cfg.receptive_field
    prime = np.asarray(jax.random.randint(
        jax.random.PRNGKey(6), (rf,), 0, cfg.classes))
    b = ContinuousBatcher(params, cfg, lanes=2, chunk=6, interpret=True)
    try:
        h0 = b.submit(prime, 20, temperature=0.0)
        _wait_for(h0, 5)
        h1 = b.submit(prime, 12, temperature=0.8, seed=4)  # hot, mid-flight
        _, c0 = h0.result(timeout=300)
        np.testing.assert_array_equal(c0, _solo(params, cfg, prime, 20))
        from pytorch_wavenet_tpu.ops.pallas.gen_kernel_hbm import (
            generate_fast_batched,
        )

        _, solo_hot = generate_fast_batched(
            params, cfg, jax.random.PRNGKey(0), 12,
            jnp.asarray(prime)[None], temperature=jnp.asarray([0.8]),
            lane_seed=jnp.asarray([4]), interpret=True)
        _, c1 = h1.result(timeout=300)
        np.testing.assert_array_equal(c1, np.asarray(solo_hot)[0])
    finally:
        b.close()


def test_prewarm_noop_then_serves(tiny):
    """prewarm() is an interpret-mode no-op (no width bucketing on CPU)
    and never disturbs a fresh pool: requests after it are still exact."""
    cfg, params = tiny
    b = ContinuousBatcher(params, cfg, lanes=2, chunk=8, interpret=True)
    try:
        b.prewarm()
        prime = np.asarray([1, 3, 2], np.int32)
        _, c = b.submit(prime, 12, temperature=0.0).result(timeout=300)
        np.testing.assert_array_equal(c, _solo(params, cfg, prime, 12))
        assert b.stats()["prime_calls"] == 1  # warm-up didn't count
    finally:
        b.close()


def test_deferred_firsts_single_sample_and_timing(tiny):
    """Round-4 sync-free admission: first samples are a device future
    delivered by _deliver_firsts. A single-sample request (whose lane
    frees immediately at admission) still completes with the exact solo
    value, deferral survives a busy pipeline, and the per-request
    lifecycle marks are filled."""
    cfg, params = tiny
    rf = cfg.receptive_field
    prime = np.asarray(jax.random.randint(
        jax.random.PRNGKey(3), (rf,), 0, cfg.classes))
    solo = _solo(params, cfg, prime, 3)
    b = ContinuousBatcher(params, cfg, lanes=2, chunk=5, interpret=True)
    try:
        # keep the pipeline busy so admission rides behind in-flight chunks
        long = b.submit(prime, 30, temperature=0.0)
        _wait_for(long, 6)
        h1 = b.submit(prime, 1, temperature=0.0)  # single-sample request
        _, cls1 = h1.result(timeout=300)
        assert cls1.shape == (1,)
        assert cls1[0] == solo[0]
        _, cls_long = long.result(timeout=300)
        np.testing.assert_array_equal(cls_long[:3], solo)
        for h in (h1, long):
            tm = h.timing
            assert {"t_submit", "t_admitted", "t_first",
                    "prime_s", "splice_s", "group"} <= set(tm)
            assert tm["t_submit"] <= tm["t_admitted"] <= tm["t_first"]
    finally:
        b.close()


def test_cancel_between_admission_and_firsts(tiny):
    """A request cancelled right after submit never wedges: it resolves
    to RequestCancelled whether the cancel lands before admission, between
    admission and firsts delivery, or at a chunk boundary."""
    from pytorch_wavenet_tpu.serving.batcher import RequestCancelled

    cfg, params = tiny
    prime = np.asarray([cfg.classes // 2], np.int32)
    b = ContinuousBatcher(params, cfg, lanes=2, chunk=5, interpret=True)
    try:
        h = b.submit(prime, 1, temperature=0.0)
        h.cancel()
        with pytest.raises(RequestCancelled):
            h.result(timeout=300)
        # the pool still serves after the cancelled single-sample request
        h2 = b.submit(prime, 4, temperature=0.0)
        _, cls = h2.result(timeout=300)
        assert cls.shape == (4,)
    finally:
        b.close()


def test_adaptive_chunking_bitwise_exact(tiny):
    """light_chunk pools dispatch short chunks when lightly loaded and
    full chunks under load — and every request's output stays bitwise
    equal to its solo rollout across the width changes (noise counts off
    request-local steps; chunk boundaries are invisible)."""
    cfg, params = tiny
    rf = cfg.receptive_field
    primes = [
        np.asarray(jax.random.randint(jax.random.fold_in(
            jax.random.PRNGKey(21), i), (rf,), 0, cfg.classes))
        for i in range(4)
    ]
    b = ContinuousBatcher(params, cfg, lanes=4, chunk=12, interpret=True,
                          light_chunk=3, light_threshold=0.5)
    try:
        # 1 active of 4 lanes = light (<= 0.5*4 = 2): short chunks
        h0 = b.submit(primes[0], 40, temperature=0.0)
        _wait_for(h0, 4)
        # pile on load to cross the threshold mid-flight: full chunks
        hs = [b.submit(primes[i], 25, temperature=0.0) for i in (1, 2, 3)]
        for h, p, n in [(h0, primes[0], 40)] + [
                (h, primes[i + 1], 25) for i, h in enumerate(hs)]:
            _, cls = h.result(timeout=300)
            np.testing.assert_array_equal(cls, _solo(params, cfg, p, n))
    finally:
        b.close()
    assert b.stats()["light_chunk"] == 3


def test_adaptive_chunking_temperature_seeded(tiny):
    """Seeded sampling at temperature>0 is also chunk-width-invariant:
    the same (prime, seed) resubmitted to a light_chunk pool under
    different load reproduces exactly."""
    cfg, params = tiny
    prime = np.asarray([cfg.classes // 2], np.int32)
    b = ContinuousBatcher(params, cfg, lanes=3, chunk=10, interpret=True,
                          light_chunk=2, light_threshold=0.4)
    try:
        h1 = b.submit(prime, 30, temperature=0.9, seed=7)
        _, cls1 = h1.result(timeout=300)
        # now with the pool busy (full-chunk regime)
        filler = b.submit(prime, 60, temperature=1.0, seed=8)
        _wait_for(filler, 4)
        h2 = b.submit(prime, 30, temperature=0.9, seed=7)
        _, cls2 = h2.result(timeout=300)
        filler.cancel()
        np.testing.assert_array_equal(cls1, cls2)
    finally:
        b.close()


def test_mesh_sharded_pool_adaptive_chunking(tiny):
    """Adaptive chunking composes with the sharded pool: chunk-width
    changes under load transitions never alter a lane's rollout on a
    4-chip mesh (the sharded_pool_step compiles per width, outputs stay
    bitwise chunk-invariant)."""
    from pytorch_wavenet_tpu.parallel.mesh import make_mesh

    cfg, params = tiny
    rf = cfg.receptive_field
    primes = [
        np.asarray(jax.random.randint(jax.random.fold_in(
            jax.random.PRNGKey(55), i), (rf,), 0, cfg.classes))
        for i in range(3)
    ]
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    b = ContinuousBatcher(params, cfg, lanes=4, chunk=8, interpret=True,
                          light_chunk=2, light_threshold=0.5, mesh=mesh)
    try:
        h0 = b.submit(primes[0], 30, temperature=0.0)  # light regime
        _wait_for(h0, 5)
        h1 = b.submit(primes[1], 20, temperature=0.0)  # crosses threshold
        h2 = b.submit(primes[2], 12, temperature=0.0)
        for h, p, n in ((h0, primes[0], 30), (h1, primes[1], 20),
                        (h2, primes[2], 12)):
            _, cls = h.result(timeout=300)
            np.testing.assert_array_equal(cls, _solo(params, cfg, p, n))
    finally:
        b.close()


def test_deliver_firsts_device_error_resolves_handles(tiny):
    """A device error surfacing at the deferred firsts materialization
    must resolve EVERY swapped-out handle (a single-sample request's
    handle lives only in the deferred list — an unresolved one would
    block its caller forever) and re-raise for the pool restart."""
    from types import SimpleNamespace

    from pytorch_wavenet_tpu.serving.batcher import (
        ContinuousBatcher as CB,
        GenerationHandle,
    )

    cfg, _ = tiny

    class _Boom:
        def __array__(self, dtype=None, copy=None):
            raise RuntimeError("device exploded")

    b = CB.__new__(CB)  # isolated: no worker thread
    b._t = dict(t_prime_sync=0.0)
    b._n = dict(failed=0, completed=0, cancelled=0, samples_out=0)
    b._active = []
    b._free = []
    b._temps = np.zeros(2, np.float32)
    h1 = GenerationHandle(1, None)
    h1._classes = cfg.classes
    h2 = GenerationHandle(1, None)
    h2._classes = cfg.classes
    act = SimpleNamespace(remaining=0, lane=0)
    b._deferred = [(_Boom(), [(h1, act, 0)]), (_Boom(), [(h2, act, 0)])]
    with pytest.raises(RuntimeError, match="device exploded"):
        b._deliver_firsts()
    assert b._deferred == []
    for h in (h1, h2):
        assert h.done()
        with pytest.raises(RuntimeError, match="device exploded"):
            h.result(timeout=1)
    assert b._n["failed"] == 2

    # the worker follows a _deliver_firsts error with _fail_all; riders it
    # already counted+finished must NOT be re-counted (round-4 advisor:
    # stats()['failed'] double-counted on a prime runtime error)
    b.lanes = 2
    b._active = [SimpleNamespace(handle=h1), SimpleNamespace(handle=h2)]
    b._fail_all(RuntimeError("restart"))
    assert b._n["failed"] == 2
    assert b._active == [] and b._state is None


def test_cond_wire_bf16_matches_rounded_solo():
    """Opt-in bf16 mel wire: a bf16-wire pool's response is bitwise equal
    to the solo rollout whose frames were rounded to bf16 ONCE (the single
    wire rounding) — chunk boundaries still never matter."""
    from pytorch_wavenet_tpu.ops.mel import (
        expand_frames_window,
        frames_window_len,
    )

    cfg = wt.get_config("tiny_vocoder")
    params = wt.init_wavenet(jax.random.PRNGKey(30), cfg)
    rf, M, hop = cfg.receptive_field, cfg.cond_channels, 4
    prime = np.asarray(jax.random.randint(
        jax.random.PRNGKey(31), (rf,), 0, cfg.classes))
    n = 17
    F = -(-(rf - 1 + n) // hop) + 2
    frames = np.asarray(0.5 * jax.random.normal(
        jax.random.PRNGKey(32), (F, M)), np.float32)
    rounded = np.asarray(
        jnp.asarray(frames, jnp.bfloat16).astype(jnp.float32))

    total = rf - 1 + n
    need = frames_window_len(total, hop)
    idx = np.minimum(np.arange(max(F, need)), F - 1)
    rows = expand_frames_window(
        None, jnp.asarray(rounded[idx])[None], hop,
        jnp.zeros(1, jnp.int32), total)
    _, solo = wt.generate_fast(
        params, cfg, jax.random.PRNGKey(9), n,
        jnp.asarray(prime)[None, :], temperature=0.0, cond=rows)

    b = ContinuousBatcher(params, cfg, lanes=2, chunk=6, interpret=True,
                          cond_hop=hop, cond_wire_dtype=jnp.bfloat16)
    try:
        h = b.submit(prime, n, temperature=0.0, cond_frames=frames)
        _, cls = h.result(timeout=300)
        np.testing.assert_array_equal(cls, np.asarray(solo)[0])
    finally:
        b.close()
