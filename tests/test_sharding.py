"""Multi-device sharding tests on the 8-virtual-device CPU mesh
(conftest sets --xla_force_host_platform_device_count=8). Sharding-invariance
property per SURVEY.md §4: 1 chip == N chips allclose."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import pytorch_wavenet_tpu as wt
from pytorch_wavenet_tpu.parallel.mesh import make_mesh, DATA_AXIS, MODEL_AXIS
from pytorch_wavenet_tpu.parallel.sharding import (
    param_pspecs,
    shard_params,
    batch_sharding,
)
from pytorch_wavenet_tpu.parallel.training import (
    make_sharded_train_state,
    parallel_train_step,
    put_batch,
    sharded_generate_fast,
)
from pytorch_wavenet_tpu.training.optimizers import reference_adam
from pytorch_wavenet_tpu.training.trainer import train_step


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    # skip_channels divisible by model axis
    cfg = wt.get_config("tiny", skip_channels=32)
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    x = jax.random.randint(key, (8, cfg.item_length), 0, cfg.classes)
    y = jax.random.randint(jax.random.PRNGKey(2), (8, cfg.output_length), 0, cfg.classes)
    return cfg, params, x, y


def test_mesh_shapes():
    m = make_mesh(4, 2)
    assert m.shape == {DATA_AXIS: 4, MODEL_AXIS: 2}
    with pytest.raises(ValueError):
        make_mesh(3, 2)


def test_param_pspecs_structure(setup):
    cfg, params, _, _ = setup
    specs = param_pspecs(cfg, params)
    assert specs["layers"]["w_skip"] == P(None, None, MODEL_AXIS)
    assert specs["end1"]["w"] == P(MODEL_AXIS, None)
    assert specs["start"]["w"] == P()


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_forward_matches_single_device(setup, shape):
    cfg, params, x, y = setup
    ref = wt.wavenet_logits(params, cfg, x)
    mesh = make_mesh(*shape)
    sp = shard_params(params, cfg, mesh)
    xs = jax.device_put(x, batch_sharding(mesh))
    out = jax.jit(wt.wavenet_logits, static_argnames=("cfg",))(sp, cfg, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


@pytest.mark.parametrize("shape", [(8, 1), (4, 2)])
def test_sharded_train_step_matches_single_device(setup, shape):
    cfg, params, x, y = setup
    tx = reference_adam(1e-3)
    # single-device baseline
    p0 = jax.tree_util.tree_map(lambda a: a.copy(), params)
    s0 = tx.init(p0)
    p1, s1, loss1, _ = train_step(p0, s0, cfg, tx, x, y)

    mesh = make_mesh(*shape)
    sp, so = make_sharded_train_state(cfg, params, tx, mesh)
    xb, yb = put_batch(mesh, x, y)
    sp2, so2, loss2 = parallel_train_step(sp, so, cfg, tx, xb, yb)

    assert float(loss2) == pytest.approx(float(loss1), abs=2e-3)
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(sp2)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_sharded_params_actually_sharded(setup):
    cfg, params, _, _ = setup
    mesh = make_mesh(1, 8)
    sp = shard_params(params, cfg, mesh)
    shard_shapes = [s.data.shape for s in sp["layers"]["w_skip"].addressable_shards]
    L, D, S = params["layers"]["w_skip"].shape
    assert all(sh == (L, D, S // 8) for sh in shard_shapes)


def test_sharded_generation_matches_single_device(setup):
    cfg, params, _, _ = setup
    prime = jax.random.randint(
        jax.random.PRNGKey(5), (8, cfg.receptive_field), 0, cfg.classes
    )
    k = jax.random.PRNGKey(6)
    _, ref = wt.generate_fast(params, cfg, k, 16, prime, temperature=0.0)

    mesh = make_mesh(8, 1)
    sp = shard_params(params, cfg, mesh)
    _, out = sharded_generate_fast(sp, cfg, mesh, k, 16, prime, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_multi_step_sharded_training_loss_decreases(setup):
    cfg, params, x, y = setup
    tx = reference_adam(3e-3)
    mesh = make_mesh(4, 2)
    sp, so = make_sharded_train_state(cfg, params, tx, mesh)
    xb, yb = put_batch(mesh, x, y)
    losses = []
    for _ in range(10):
        sp, so, loss = parallel_train_step(sp, so, cfg, tx, xb, yb)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_sharded_batch_iterator(tmp_path):
    """Single-process path of the multi-host iterator: global batches come
    out sharded over the data axis and match the plain iterator's content."""
    import numpy as np
    from pytorch_wavenet_tpu.data.audio_io import write_wav
    from pytorch_wavenet_tpu.parallel.data_sharding import ShardedBatchIterator

    d = tmp_path / "audio"
    d.mkdir()
    wav = 0.3 * np.sin(np.arange(32000) * 0.05)
    write_wav(str(d / "t.wav"), wav, 16000)
    ds = wt.WaveNetDataset(
        dataset_file=str(d / "ds.npz"), item_length=64, target_length=8,
        file_location=str(d), test_stride=50,
    )
    mesh = make_mesh(8, 1)
    it = ShardedBatchIterator(ds, 16, mesh, seed=3)
    x, y = next(iter(it))
    assert x.shape == (16, 64) and y.shape == (16, 8)
    assert len(x.sharding.device_set) == 8
    ref = next(iter(wt.BatchIterator(ds, 16, seed=3)))
    np.testing.assert_array_equal(np.asarray(x), ref[0])
    np.testing.assert_array_equal(np.asarray(y), ref[1])
    assert len(it) == len(ds) // 16

    with pytest.raises(ValueError):
        ShardedBatchIterator(ds, 7, mesh)


def test_shard_map_batched_generation(setup):
    """Each chip runs the fused HBM kernel on its stream shard; argmax
    rollouts must equal the single-device XLA path stream-for-stream."""
    from pytorch_wavenet_tpu.parallel.training import (
        sharded_generate_fast_batched,
    )

    cfg, params, _, _ = setup
    prime = jax.random.randint(
        jax.random.PRNGKey(21), (8, cfg.receptive_field), 0, cfg.classes
    )
    k = jax.random.PRNGKey(22)
    _, ref = wt.generate_fast(params, cfg, k, 16, prime, temperature=0.0)

    mesh = make_mesh(8, 1)
    wav, out = sharded_generate_fast_batched(
        params, cfg, mesh, k, 16, prime, temperature=0.0, interpret=True
    )
    assert out.shape == (8, 16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    with pytest.raises(ValueError):
        sharded_generate_fast_batched(
            params, cfg, mesh, k, 4, prime[:3], temperature=0.0, interpret=True
        )

    # bf16 rings thread through shard_map; tiny-scale rollouts stay close
    # to the f32 rollout (bf16 rounds the residual stream once per layer)
    _, o16 = sharded_generate_fast_batched(
        params, cfg, mesh, k, 16, prime, temperature=0.0, interpret=True,
        ring_dtype=jnp.bfloat16,
    )
    assert (np.asarray(o16) == np.asarray(ref)).mean() >= 0.9


def test_sharded_conditioned_vocoder_training():
    """Model-parallel training of a conditioned model: the conditioning
    weights replicate, the head shards, and the step runs on a (2,4) mesh
    (BASELINE config 5's 'model sharded across chips')."""
    import optax
    from pytorch_wavenet_tpu.training.trainer import cross_entropy_loss

    cfg = wt.get_config("tiny", skip_channels=32, cond_channels=4)
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    specs = param_pspecs(cfg, params)
    assert specs["layers"]["w_cond"] == P()

    mesh = make_mesh(2, 4)
    tx = reference_adam(1e-3)
    sp, so = make_sharded_train_state(cfg, params, tx, mesh)
    x = jax.random.randint(jax.random.PRNGKey(1), (4, cfg.item_length), 0, cfg.classes)
    y = jax.random.randint(jax.random.PRNGKey(2), (4, cfg.output_length), 0, cfg.classes)
    cond = jax.random.normal(jax.random.PRNGKey(3), (4, cfg.item_length, 4))
    xb, yb = put_batch(mesh, x, y)
    cb = jax.device_put(cond, batch_sharding(mesh))

    @jax.jit
    def step(p, o, x, y, c):
        loss, g = jax.value_and_grad(cross_entropy_loss)(p, cfg, x, y, c)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    losses = []
    for _ in range(4):
        sp, so, loss = step(sp, so, xb, yb, cb)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # matches the single-device conditioned loss
    l_ref = float(cross_entropy_loss(params, cfg, x, y, cond))
    assert abs(losses[0] - l_ref) < 5e-3


def test_sharded_trainer_snapshot_resume_validate(tmp_path_factory):
    """End-to-end mesh-mode trainer on a (4, 2) mesh: trains with sharded
    params/batches, snapshots (process-0 write path), exact-resumes onto the
    mesh, and validates with data-sharded eval batches."""
    d = tmp_path_factory.mktemp("audio_mesh")
    t = np.arange(16000) / 16000.0
    wav = 0.5 * np.sin(2 * np.pi * 330 * t) * np.sin(2 * np.pi * 1.5 * t)
    wt.write_wav(str(d / "tone.wav"), wav, 16000)
    cfg = wt.get_config("tiny", skip_channels=32)
    ds = wt.WaveNetDataset(
        dataset_file=str(d / "ds.npz"), item_length=cfg.item_length,
        target_length=cfg.output_length, file_location=str(d),
        classes=cfg.classes, test_stride=20,
    )
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(4, 2)
    snap = str(tmp_path_factory.mktemp("snaps_mesh"))

    tr = wt.WaveNetTrainer(
        cfg, params, ds, lr=1e-3, mesh=mesh, snapshot_path=snap,
        snapshot_name="m", snapshot_interval=4,
    )
    # params actually sharded on the mesh
    skip_shard = tr.params["layers"]["w_skip"].sharding
    assert skip_shard.spec == P(None, None, MODEL_AXIS)
    tr.train(batch_size=8, epochs=1, max_steps=6)
    at_six = jax.tree_util.tree_map(lambda x: np.asarray(x), tr.params)

    tr2 = wt.WaveNetTrainer(
        cfg, params, ds, lr=1e-3, mesh=mesh, snapshot_path=snap,
    )
    step = tr2.resume()
    assert step == 4
    assert tr2.params["layers"]["w_skip"].sharding.spec == P(None, None, MODEL_AXIS)
    # optimizer moments resharded alongside
    moments = [
        x for x in jax.tree_util.tree_leaves(tr2.opt_state)
        if hasattr(x, "sharding") and x.ndim >= 3
    ]
    assert moments

    # validate: batches sharded over data, finite results
    loss, acc = tr2.validate(batch_size=8)
    assert np.isfinite(loss) and 0.0 <= acc <= 1.0

    # resumed mesh run continues identically to the uninterrupted one
    tr2.train(batch_size=8, epochs=1, continue_training_at_step=step,
              max_steps=6)
    for a, b in zip(jax.tree_util.tree_leaves(at_six),
                    jax.tree_util.tree_leaves(
                        jax.tree_util.tree_map(lambda x: np.asarray(x),
                                               tr2.params))):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_time_sharded_logits_match_unsharded():
    """Context parallelism (SURVEY §5): the trunk with T sharded over 8
    chips and per-layer halo exchange equals the unsharded trunk."""
    from pytorch_wavenet_tpu.parallel.time_sharding import (
        max_halo, time_sharded_logits,
    )

    cfg = wt.get_config("tiny")  # max halo (k-1)*4 = 4
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(8, 1)
    T = 8 * 16  # 16 per shard >= halo 4
    assert T // 8 >= max_halo(cfg)
    x = jax.random.randint(jax.random.PRNGKey(1), (2, T), 0, cfg.classes)

    ref = np.asarray(wt.wavenet_logits(params, cfg, x, out_len=T))
    sharded = np.asarray(time_sharded_logits(params, cfg, x, mesh))
    np.testing.assert_allclose(sharded, ref, atol=2e-4)


def test_time_sharded_logits_kernel_size_3():
    from pytorch_wavenet_tpu.parallel.time_sharding import time_sharded_logits

    cfg = wt.get_config("tiny", kernel_size=3)  # halo 2*4 = 8
    params = wt.init_wavenet(jax.random.PRNGKey(2), cfg)
    mesh = make_mesh(4, 2)  # time over the 4-way axis
    T = 4 * 12
    x = jax.random.randint(jax.random.PRNGKey(3), (1, T), 0, cfg.classes)
    ref = np.asarray(wt.wavenet_logits(params, cfg, x, out_len=T))
    sharded = np.asarray(time_sharded_logits(params, cfg, x, mesh))
    np.testing.assert_allclose(sharded, ref, atol=2e-4)


def test_time_sharded_loss_and_grads_match():
    """Masked CE over the valid suffix: value and gradients agree with the
    unsharded computation (training over sharded time is exact)."""
    from pytorch_wavenet_tpu.parallel.time_sharding import time_sharded_loss

    cfg = wt.get_config("tiny")
    params = wt.init_wavenet(jax.random.PRNGKey(4), cfg)
    mesh = make_mesh(8, 1)
    T = 8 * 8
    rf = cfg.receptive_field
    x = jax.random.randint(jax.random.PRNGKey(5), (2, T), 0, cfg.classes)
    tgt = jax.random.randint(jax.random.PRNGKey(6), (2, T), 0, cfg.classes)

    def ref_loss(p):
        logits = wt.wavenet_logits(p, cfg, x, out_len=T)
        valid = (jnp.arange(T)[None, :] >= rf - 1).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * valid) / (jnp.sum(valid) * x.shape[0])

    l_ref, g_ref = jax.value_and_grad(ref_loss)(params)
    l_sh, g_sh = jax.value_and_grad(
        lambda p: time_sharded_loss(p, cfg, x, tgt, mesh)
    )(params)
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_time_sharded_rejects_small_shards():
    from pytorch_wavenet_tpu.parallel.time_sharding import time_sharded_logits

    cfg = wt.get_config("tiny")
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(8, 1)
    with pytest.raises(ValueError, match="halo"):
        time_sharded_logits(
            params, cfg, jnp.zeros((1, 16), jnp.int32), mesh
        )
    with pytest.raises(ValueError, match="divisible"):
        time_sharded_logits(
            params, cfg, jnp.zeros((1, 129), jnp.int32), mesh
        )


def test_sharded_pool_step_matches_unsharded(setup):
    """The multi-chip batcher backend: a pool step with lanes sharded over
    4 chips is bitwise identical to the single-device step — including
    temperature>0 lanes, whose noise rides the per-lane request counters."""
    from pytorch_wavenet_tpu.ops.pallas.gen_kernel_hbm import (
        generate_fast_batched,
    )
    from pytorch_wavenet_tpu.parallel.training import sharded_pool_step

    cfg, params, _, _ = setup
    rf = cfg.receptive_field
    lanes, chunk = 8, 6
    prime = jax.random.randint(
        jax.random.PRNGKey(30), (lanes, rf), 0, cfg.classes)
    temps = jnp.asarray([0.0, 1.0, 0.7, 0.0, 1.3, 1.0, 0.0, 0.9])
    seeds = jnp.arange(lanes, dtype=jnp.int32) * 17
    toffs = jnp.asarray([0, 3, 0, 0, -2, 0, 1, 0], jnp.int32)

    key = jax.random.PRNGKey(31)
    _, _, st = generate_fast_batched(
        params, cfg, key, 1, prime, temperature=temps, lane_seed=seeds,
        lane_clock=toffs, return_state=True, interpret=True)

    _, ref, st_ref = generate_fast_batched(
        params, cfg, key, chunk, None, temperature=temps, state=st,
        lane_seed=seeds, lane_clock=toffs, return_state=True,
        interpret=True)

    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    out, st2 = sharded_pool_step(
        params, cfg, mesh, jax.random.PRNGKey(99), chunk, st,
        temperature=temps, lane_seed=seeds, lane_clock=toffs,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(st2.cls),
                                  np.asarray(st_ref.cls))
    assert int(st2.t) == int(st_ref.t)
    np.testing.assert_array_equal(np.asarray(st2.ring),
                                  np.asarray(st_ref.ring))

    # a second chained sharded step consumes the sharded state it returned
    out2, _ = sharded_pool_step(
        params, cfg, mesh, jax.random.PRNGKey(5), chunk, st2,
        temperature=temps, lane_seed=seeds, lane_clock=toffs,
        interpret=True)
    _, ref2, _ = generate_fast_batched(
        params, cfg, key, chunk, None, temperature=temps, state=st_ref,
        lane_seed=seeds, lane_clock=toffs, return_state=True,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref2))
