"""Trainer, optimizer, checkpoint, and logger tests.

The reference's de-facto integration test is test_script.py (trains a small
model end-to-end with timing); here that becomes a real test: loss must
decrease, snapshots must round-trip exactly, resume must continue from the
saved step.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import pytorch_wavenet_tpu as wt
from pytorch_wavenet_tpu.training.trainer import cross_entropy_loss
from pytorch_wavenet_tpu.training.optimizers import sgd_normalized


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    cfg = wt.get_config("tiny")
    d = tmp_path_factory.mktemp("audio")
    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000.0
    wav = 0.6 * np.sin(2 * np.pi * 110 * t) * np.sin(2 * np.pi * 0.5 * t)
    wt.write_wav(str(d / "tone.wav"), wav, 16000)
    ds = wt.WaveNetDataset(
        dataset_file=str(d / "dataset.npz"),
        item_length=cfg.item_length,
        target_length=cfg.output_length,
        file_location=str(d),
        classes=cfg.classes,
        test_stride=20,
    )
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    return cfg, params, ds


def test_loss_decreases(tiny_setup, tmp_path):
    cfg, params, ds = tiny_setup
    trainer = wt.WaveNetTrainer(cfg, params, ds, lr=3e-3)
    x, y = next(iter(wt.BatchIterator(ds, 8, seed=0)))
    l0 = float(cross_entropy_loss(trainer.params, cfg, jnp.asarray(x), jnp.asarray(y)))
    trainer.train(batch_size=8, epochs=100, max_steps=30)
    l1 = float(cross_entropy_loss(trainer.params, cfg, jnp.asarray(x), jnp.asarray(y)))
    assert trainer.step == 30
    assert l1 < l0
    # initial loss should be ~uniform prediction: log(classes)
    assert abs(l0 - np.log(cfg.classes)) < 1.0


def test_validate(tiny_setup):
    cfg, params, ds = tiny_setup
    trainer = wt.WaveNetTrainer(cfg, params, ds)
    loss, acc = trainer.validate(batch_size=8)
    assert np.isfinite(loss)
    assert 0.0 <= acc <= 1.0
    assert ds.train  # restored after validation


def test_gradient_clipping_applies(tiny_setup):
    cfg, params, ds = tiny_setup
    x, y = next(iter(wt.BatchIterator(ds, 4, seed=0)))
    x, y = jnp.asarray(x), jnp.asarray(y)
    grads = jax.grad(cross_entropy_loss)(params, cfg, x, y)
    gnorm = optax.global_norm(grads)
    clip = float(gnorm) / 2.0
    tx = wt.reference_adam(1e-3, gradient_clipping=clip)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    assert np.isfinite(optax.global_norm(updates))


def test_snapshot_and_resume(tiny_setup, tmp_path):
    cfg, params, ds = tiny_setup
    snap = str(tmp_path / "snaps")
    trainer = wt.WaveNetTrainer(
        cfg, params, ds, lr=1e-3, snapshot_path=snap,
        snapshot_name="t", snapshot_interval=5,
    )
    trainer.train(batch_size=4, epochs=10, max_steps=7)
    files = os.listdir(snap)
    assert any(f.startswith("t_") for f in files)

    trainer2 = wt.WaveNetTrainer(cfg, params, ds, lr=1e-3, snapshot_path=snap)
    step = trainer2.resume()
    assert step == 5
    # params restored exactly
    saved = wt.load_latest_model_from(snap)
    for (n1, a), (n2, b) in zip(
        jax.tree_util.tree_leaves_with_path(trainer2.params),
        jax.tree_util.tree_leaves_with_path(saved["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a[1] if isinstance(a, tuple) else a),
                                      np.asarray(b[1] if isinstance(b, tuple) else b))
    assert saved["config"] == cfg
    # optimizer state restored with correct structure
    assert trainer2.opt_state is not None


def test_checkpoint_roundtrip_exact(tmp_path):
    cfg = wt.get_config("tiny")
    params = wt.init_wavenet(jax.random.PRNGKey(1), cfg)
    p = wt.save_checkpoint(str(tmp_path), "m", 42, params, cfg=cfg)
    blob = wt.load_checkpoint(p)
    assert blob["step"] == 42
    assert blob["config"] == cfg
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(blob["params"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_checkpoint_picks_highest_step(tmp_path):
    cfg = wt.get_config("tiny")
    params = wt.init_wavenet(jax.random.PRNGKey(1), cfg)
    wt.save_checkpoint(str(tmp_path), "m", 10, params, cfg=cfg)
    p2 = wt.save_checkpoint(str(tmp_path), "m", 200, params, cfg=cfg)
    wt.save_checkpoint(str(tmp_path), "m", 30, params, cfg=cfg)
    assert wt.latest_checkpoint(str(tmp_path)) == p2


def test_sgd_normalized_step_norm():
    """The raw step must have norm lr per tensor
    (reference: optimizers.py:84-85)."""
    params = {"a": jnp.ones((4, 4)), "b": jnp.ones((3,))}
    grads = {"a": jnp.full((4, 4), 2.0), "b": jnp.full((3,), -1.0)}
    tx = sgd_normalized(lr=0.1)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    for leaf in jax.tree_util.tree_leaves(updates):
        np.testing.assert_allclose(
            float(jnp.sqrt(jnp.sum(leaf**2))), 0.1, rtol=1e-5
        )


def test_sgd_normalized_momentum_and_nesterov():
    params = {"a": jnp.ones((2,))}
    grads = {"a": jnp.asarray([3.0, 4.0])}  # norm 5
    tx = sgd_normalized(lr=1.0, momentum=0.9)
    state = tx.init(params)
    up1, state = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(up1["a"]), [-0.6, -0.8], rtol=1e-6)
    up2, state = tx.update(grads, state, params)
    # buf = 0.9*d + d = 1.9*d
    np.testing.assert_allclose(np.asarray(up2["a"]), [-1.14, -1.52], rtol=1e-6)
    with pytest.raises(ValueError):
        sgd_normalized(nesterov=True)


def test_generate_audio_stacks_temperatures(tiny_setup):
    cfg, params, ds = tiny_setup
    out = wt.generate_audio(params, cfg, length=16, temperatures=[0.0, 1.0])
    assert out.shape == (2, 16)
    assert np.isfinite(out).all()


def test_logger_cadence(capsys):
    calls = {"v": 0, "g": 0}

    class T:
        def validate(self):
            calls["v"] += 1
            return 1.0, 0.5

    done = []
    logger = wt.Logger(
        log_interval=2, validation_interval=4, generate_interval=100,
        trainer=T(), generate_function=lambda step: done.append(step),
    )
    for s in range(1, 9):
        logger.log(s, 1.0)
    assert calls["v"] == 2  # steps 4 and 8
    out = capsys.readouterr().out
    assert "loss at step 2" in out and "loss at step 8" in out


def test_logger_generate_thread():
    import threading

    ev = threading.Event()
    logger = wt.Logger(generate_interval=1, generate_function=lambda s: ev.set())
    logger.log(1, 0.0)
    assert ev.wait(timeout=5)


def test_tensorboard_logger_end_to_end(tiny_setup, tmp_path):
    """Training with the TB logger writes scalar + per-parameter and
    per-gradient histogram events (reference: model_logging.py:73-83)."""
    cfg, params, ds = tiny_setup
    logger = wt.TensorboardLogger(
        log_interval=2, validation_interval=10**6, generate_interval=10**6,
        log_dir=str(tmp_path),
    )
    trainer = wt.WaveNetTrainer(cfg, params, ds, lr=1e-3, logger=logger)
    trainer.train(batch_size=4, epochs=1, max_steps=4)
    logger.close()

    from test_tensorboard import _read_records, _parse_fields

    records = _read_records(logger.writer.path)
    assert len(records) > 2
    tags = []
    for r in records[1:]:
        ev = _parse_fields(r)
        if 5 in ev:
            for v in _parse_fields(ev[5][0])[1]:
                tags.append(_parse_fields(v)[1][0].decode())
    assert "loss" in tags
    assert any(t.endswith("/grad") for t in tags)
    assert any("w_skip" in t for t in tags)


class _LossRecorder(wt.Logger):
    def __init__(self):
        super().__init__(log_interval=10**9, validation_interval=10**9,
                         generate_interval=10**9)
        self.losses = []

    def log(self, current_step, current_loss):
        self.losses.append(float(current_loss))


def test_resume_consumes_same_data_stream(tiny_setup, tmp_path):
    """Step N's batch (hence loss) must be identical with and without an
    intervening snapshot/resume — the epoch permutation is fast-forwarded,
    not restarted (the reference re-consumes early batches,
    wavenet_training.py:50-60)."""
    cfg, params, ds = tiny_setup
    snap = str(tmp_path / "snaps_resume")

    rec_a = _LossRecorder()
    a = wt.WaveNetTrainer(cfg, params, ds, lr=1e-3, logger=rec_a, seed=3)
    a.train(batch_size=4, epochs=10, max_steps=8)

    rec_b = _LossRecorder()
    b = wt.WaveNetTrainer(
        cfg, params, ds, lr=1e-3, logger=rec_b, seed=3,
        snapshot_path=snap, snapshot_name="r", snapshot_interval=4,
    )
    b.train(batch_size=4, epochs=10, max_steps=4)

    rec_c = _LossRecorder()
    c = wt.WaveNetTrainer(
        cfg, params, ds, lr=1e-3, logger=rec_c, seed=3, snapshot_path=snap,
    )
    step = c.resume()
    assert step == 4
    c.train(batch_size=4, epochs=10, continue_training_at_step=step,
            max_steps=8)

    np.testing.assert_allclose(rec_a.losses[:4], rec_b.losses, rtol=1e-6)
    # steps 5-8 see the same batches (and the same params, thanks to exact
    # optimizer-state resume) as the uninterrupted run
    np.testing.assert_allclose(rec_a.losses[4:], rec_c.losses, rtol=1e-5)


def test_resume_fast_forwards_across_epochs(tiny_setup, tmp_path):
    """continue_training_at_step beyond one epoch lands in the right epoch's
    permutation at the right offset."""
    cfg, params, ds = tiny_setup
    bs = 64  # few batches per epoch
    spe = len(wt.BatchIterator(ds, bs))
    assert spe >= 2
    target = spe + 1  # one full epoch + one batch

    rec_a = _LossRecorder()
    a = wt.WaveNetTrainer(cfg, params, ds, lr=1e-3, logger=rec_a, seed=5)
    a.train(batch_size=bs, epochs=10, max_steps=target + 2)

    rec_b = _LossRecorder()
    b = wt.WaveNetTrainer(cfg, params, ds, lr=1e-3, logger=rec_b, seed=5)
    b.train(batch_size=bs, epochs=10, max_steps=target)
    # continue the same trainer (params/opt state already live)
    b.train(batch_size=bs, epochs=10, continue_training_at_step=target,
            max_steps=target + 2)
    np.testing.assert_allclose(rec_a.losses, rec_b.losses, rtol=1e-5)


def test_async_snapshot_is_donation_safe(tiny_setup, tmp_path):
    """snapshot() must capture the params at call time even though the very
    next train step donates (invalidates) those buffers."""
    cfg, params, ds = tiny_setup
    snap = str(tmp_path / "snaps_async")
    tr = wt.WaveNetTrainer(
        cfg, params, ds, lr=1e-2, snapshot_path=snap, snapshot_name="a",
    )
    tr.train(batch_size=4, epochs=1, max_steps=3)
    at_snapshot = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                                         tr.params)
    path = tr.snapshot()  # async
    tr.train(batch_size=4, epochs=1, continue_training_at_step=3,
             max_steps=6)  # donates the snapshotted buffers
    tr._ckpt.wait()
    blob = wt.load_checkpoint(path)
    assert blob["step"] == 3
    for a, b in zip(jax.tree_util.tree_leaves(at_snapshot),
                    jax.tree_util.tree_leaves(blob["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
