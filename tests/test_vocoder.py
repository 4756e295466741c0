"""Mel featurization and conditioned-vocoder tests (BASELINE config 5 —
capability beyond the unconditional reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_wavenet_tpu as wt
from pytorch_wavenet_tpu.ops.mel import (
    mel_filterbank,
    log_mel_spectrogram,
    upsample_frames,
    hz_to_mel,
    mel_to_hz,
)


def test_mel_scale_roundtrip():
    f = np.asarray([0.0, 440.0, 8000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)


def test_filterbank_shape_and_coverage():
    fb = mel_filterbank(num_mels=40, n_fft=512, sampling_rate=16000)
    assert fb.shape == (257, 40)
    assert (fb >= 0).all()
    # every filter has support; interior bins are covered
    assert (fb.sum(axis=0) > 0).all()
    assert (fb[10:-10].sum(axis=1) > 0).any()


def test_log_mel_shapes_and_tone():
    sr, n = 16000, 16000
    t = np.arange(n) / sr
    wav = 0.5 * np.sin(2 * np.pi * 1000 * t)
    mel = log_mel_spectrogram(wav, num_mels=64, n_fft=1024, hop_length=256)
    assert mel.shape == (1 + n // 256, 64)
    assert np.isfinite(mel).all()
    # energy concentrates around the 1 kHz band
    band = mel.mean(axis=0)
    assert band.argmax() not in (0, 63)


def test_upsample_frames():
    frames = jnp.asarray([[0.0, 10.0], [1.0, 20.0], [2.0, 30.0]])  # (3, 2)
    up = upsample_frames(frames, hop_length=4, length=9)
    assert up.shape == (9, 2)
    np.testing.assert_allclose(np.asarray(up[0]), [0.0, 10.0])
    np.testing.assert_allclose(np.asarray(up[4]), [1.0, 20.0])
    np.testing.assert_allclose(np.asarray(up[2]), [0.5, 15.0])  # midpoint


def test_log_mel_batched_equals_per_item():
    """The input pipeline computes mels for a whole batch in one vectorized
    call; it must equal the per-item path exactly."""
    rng = np.random.default_rng(0)
    wavs = rng.standard_normal((3, 2048)).astype(np.float32)
    batched = log_mel_spectrogram(wavs, num_mels=16, n_fft=256, hop_length=64)
    for b in range(3):
        single = log_mel_spectrogram(wavs[b], num_mels=16, n_fft=256, hop_length=64)
        # batched FFT uses a different internal path; tiny FP noise is fine
        np.testing.assert_allclose(batched[b], single, atol=1e-5)


def test_upsample_frames_np_equals_jnp():
    from pytorch_wavenet_tpu.ops.mel import upsample_frames_np

    rng = np.random.default_rng(1)
    frames = rng.standard_normal((2, 7, 5)).astype(np.float32)
    np_up = upsample_frames_np(frames, hop_length=3, length=20)
    j_up = np.asarray(upsample_frames(jnp.asarray(frames), 3, 20))
    np.testing.assert_allclose(np_up, j_up, atol=1e-6)


def test_mel_for_windows_is_host_only(monkeypatch):
    """The batch featurizer must never dispatch to the device (the round-1
    per-item jnp round-trip cost ~0.4 s per batch through the axon tunnel)."""
    from pytorch_wavenet_tpu.data import mel_dataset

    calls = []
    monkeypatch.setattr(
        jax, "device_put", lambda *a, **k: calls.append(1) or a[0]
    )

    ds = object.__new__(mel_dataset.MelWaveNetDataset)
    ds.num_mels, ds.n_fft, ds.hop_length = 8, 256, 64
    ds.classes, ds.sampling_rate = 256, 16000
    ds.device_upsample = False  # exercise the host-upsampled variant
    x = np.random.default_rng(2).integers(0, 256, (4, 512), dtype=np.int64)
    out = ds._mel_for_windows(x)
    assert isinstance(out, np.ndarray)
    assert out.shape == (4, 512, 8)
    assert not calls


@pytest.fixture(scope="module")
def cond_setup():
    cfg = wt.get_config("tiny", cond_channels=6)
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_conditioned_param_count(cond_setup):
    cfg, params = cond_setup
    assert wt.parameter_count(params) == cfg.parameter_count()
    assert params["layers"]["w_cond"].shape == (
        cfg.num_layers, 6, 2 * cfg.dilation_channels
    )


def test_conditioning_changes_logits(cond_setup):
    cfg, params = cond_setup
    x = jax.random.randint(jax.random.PRNGKey(1), (2, cfg.item_length), 0, cfg.classes)
    c0 = jnp.zeros((2, cfg.item_length, 6))
    c1 = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.item_length, 6))
    y0 = wt.wavenet_logits(params, cfg, x, cond=c0)
    y1 = wt.wavenet_logits(params, cfg, x, cond=c1)
    assert np.abs(np.asarray(y0) - np.asarray(y1)).max() > 1e-3
    # zero conditioning == unconditioned math
    y_n = wt.wavenet_logits(params, cfg, x, cond=None)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y_n), atol=1e-5)


def test_conditioned_fast_equals_naive(cond_setup):
    """The conditioned fast path must match the conditioned oracle —
    timeline alignment of cond rows is the thing being pinned."""
    cfg, params = cond_setup
    rf = cfg.receptive_field
    n = 24
    prime = jax.random.randint(jax.random.PRNGKey(3), (2, rf), 0, cfg.classes)
    total = rf - 1 + n
    cond = 0.5 * jax.random.normal(jax.random.PRNGKey(4), (2, total, 6))
    k = jax.random.PRNGKey(5)
    _, cf = wt.generate_fast(params, cfg, k, n, prime, temperature=0.0, cond=cond)
    _, cn = wt.generate(params, cfg, k, n, prime, temperature=0.0, cond=cond)
    np.testing.assert_array_equal(np.asarray(cf), np.asarray(cn))
    # and conditioning changes what gets generated
    _, cu = wt.generate_fast(params, cfg, k, n, prime, temperature=0.0)
    assert not np.array_equal(np.asarray(cf), np.asarray(cu))


def test_conditioned_progress_callback_bitwise(cond_setup):
    """Conditioned generate_fast with a progress_callback slices the cond
    timeline per chunk and stays bitwise equal to the single-shot
    conditioned rollout at temperature 0 (closes the reference's
    progress-hook surface for the vocoder path; reference:
    wavenet_model.py:308-311). Covers a multi-sample prime in chunk 0
    plus resumed chunks, including a final partial chunk."""
    cfg, params = cond_setup
    rf = cfg.receptive_field
    n = 50
    prime = jax.random.randint(jax.random.PRNGKey(6), (2, rf), 0, cfg.classes)
    total = rf - 1 + n
    cond = 0.5 * jax.random.normal(jax.random.PRNGKey(7), (2, total, 6))
    k = jax.random.PRNGKey(8)
    _, ref = wt.generate_fast(params, cfg, k, n, prime, temperature=0.0,
                              cond=cond)
    calls = []
    _, out = wt.generate_fast(
        params, cfg, k, n, prime, temperature=0.0, cond=cond,
        progress_callback=lambda done, tot: calls.append((done, tot)),
        progress_interval=20,
    )
    assert calls == [(20, 50), (40, 50), (50, 50)]
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_mel_dataset_and_vocoder_training(tmp_path):
    from pytorch_wavenet_tpu.data.mel_dataset import MelWaveNetDataset
    from pytorch_wavenet_tpu.training.trainer import cross_entropy_loss

    cfg = wt.get_config("tiny", cond_channels=8)
    d = tmp_path / "audio"
    d.mkdir()
    t = np.arange(16000) / 16000.0
    wav = 0.5 * np.sin(2 * np.pi * 220 * t) * np.sin(2 * np.pi * 2 * t)
    wt.write_wav(str(d / "tone.wav"), wav, 16000)
    ds = MelWaveNetDataset(
        dataset_file=str(d / "ds.npz"),
        item_length=cfg.item_length,
        target_length=cfg.output_length,
        file_location=str(d),
        classes=cfg.classes,
        test_stride=20,
        num_mels=8,
        n_fft=256,
        hop_length=64,
    )
    # default: frame-resolution cond (device_upsample), ~hop x smaller
    x, y, cond = ds.get_batch([0, 1, 2])
    n_frames = 1 + cfg.item_length // 64
    assert cond.shape == (3, n_frames, 8)
    assert np.isfinite(cond).all()
    x1, y1, c1 = ds[0]
    np.testing.assert_array_equal(x1, x[0])
    np.testing.assert_allclose(c1, cond[0], atol=1e-5)

    # host-upsampled mode matches device upsampling of the frames
    from pytorch_wavenet_tpu.ops.mel import upsample_frames

    ds.device_upsample = False
    _, _, cond_rows = ds.get_batch([0, 1, 2])
    ds.device_upsample = True
    assert cond_rows.shape == (3, cfg.item_length, 8)
    np.testing.assert_allclose(
        np.asarray(upsample_frames(jnp.asarray(cond), 64, cfg.item_length)),
        cond_rows, atol=1e-5,
    )

    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    trainer = wt.WaveNetTrainer(cfg, params, ds, lr=3e-3)
    assert trainer._cond_hop == 64  # frame cond auto-detected
    xb, yb, cb = ds.get_batch(list(range(8)))
    l0 = float(cross_entropy_loss(trainer.params, cfg, jnp.asarray(xb),
                                  jnp.asarray(yb), jnp.asarray(cb),
                                  cond_hop=64))
    trainer.train(batch_size=8, epochs=50, max_steps=15)
    l1 = float(cross_entropy_loss(trainer.params, cfg, jnp.asarray(xb),
                                  jnp.asarray(yb), jnp.asarray(cb),
                                  cond_hop=64))
    assert l1 < l0
    loss, acc = trainer.validate(batch_size=4)
    assert np.isfinite(loss) and 0 <= acc <= 1


def test_upsample_conv_linear_init_matches_linear():
    """With linear-interpolation init, the learnable transposed-conv stack
    must reproduce upsample_frames exactly — for any factorization of the
    hop, including multi-stage (refining a piecewise-linear signal on a
    finer grid is the identity)."""
    from pytorch_wavenet_tpu.ops.mel import (
        linear_init_upsampler,
        upsample_frames_conv,
    )

    rng = np.random.default_rng(7)
    frames = jnp.asarray(rng.standard_normal((2, 9, 5)).astype(np.float32))
    for factors in [(12,), (3, 4), (2, 2, 3)]:
        up = {k: jnp.asarray(v) for k, v in
              linear_init_upsampler(factors, 5).items()}
        got = upsample_frames_conv(up, frames, factors, 100)
        want = upsample_frames(frames, 12, 100)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5,
            err_msg=f"factors={factors}",
        )
    # too few frames for the requested length is a hard error
    with pytest.raises(ValueError):
        upsample_frames_conv(up, frames, (2, 2, 3), 109)


def test_learnable_upsampler_model_integration():
    """cond_upsample config: params carry the stack, parameter_count
    agrees, upsample_cond starts bit-equal to linear interpolation and
    rejects a mismatched hop, and the config survives a JSON roundtrip."""
    from pytorch_wavenet_tpu.config import WaveNetConfig

    cfg = wt.get_config("tiny", cond_channels=6, cond_upsample=(4, 4))
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    assert "cond_up" in params
    assert params["cond_up"]["s0"].shape == (2, 4, 6, 6)
    assert wt.parameter_count(params) == cfg.parameter_count()

    frames = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 6))
    got = wt.upsample_cond(params, cfg, frames, hop_length=16, length=70)
    want = upsample_frames(frames, 16, 70)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    with pytest.raises(ValueError):
        wt.upsample_cond(params, cfg, frames, hop_length=64, length=70)

    cfg2 = WaveNetConfig.from_json(cfg.to_json())
    assert cfg2 == cfg and isinstance(cfg2.cond_upsample, tuple)
    # hashability matters: the config is a static jit argument
    hash(cfg2)


def test_learnable_upsampler_trains(tmp_path):
    """End-to-end: with cond_upsample enabled the trainer must move the
    upsampler weights (they sit inside the jitted loss) and reduce loss."""
    from pytorch_wavenet_tpu.data.mel_dataset import MelWaveNetDataset

    cfg = wt.get_config("tiny", cond_channels=8, cond_upsample=(8, 8))
    d = tmp_path / "audio"
    d.mkdir()
    t = np.arange(12000) / 16000.0
    wav = 0.5 * np.sin(2 * np.pi * 330 * t) * np.sin(2 * np.pi * 3 * t)
    wt.write_wav(str(d / "tone.wav"), wav, 16000)
    ds = MelWaveNetDataset(
        dataset_file=str(d / "ds.npz"),
        item_length=cfg.item_length,
        target_length=cfg.output_length,
        file_location=str(d),
        classes=cfg.classes,
        test_stride=20,
        num_mels=8,
        n_fft=256,
        hop_length=64,
    )
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    before = np.asarray(params["cond_up"]["s0"]).copy()
    trainer = wt.WaveNetTrainer(cfg, params, ds, lr=3e-3)
    trainer.train(batch_size=4, epochs=50, max_steps=8)
    after = np.asarray(trainer.params["cond_up"]["s0"])
    assert np.abs(after - before).max() > 1e-6


def test_synthesize_api():
    """synthesize() = upsample_cond + generate_fast, exactly: the vocoder
    serving entry must match the manual composition at temperature 0, with
    both the linear and the learnable upsampling path."""
    from pytorch_wavenet_tpu.ops.mel import upsample_frames

    hop, F, M = 16, 6, 6
    key = jax.random.PRNGKey(9)
    for upsample in [(), (4, 4)]:
        cfg = wt.get_config("tiny", cond_channels=M, cond_upsample=upsample)
        params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
        mel = jax.random.normal(jax.random.PRNGKey(1), (2, F, M))
        wav, cls = wt.synthesize(params, cfg, key, mel, hop, temperature=0.0)
        total = F * hop  # default: one mid-class prime sample, num_given=1
        assert cls.shape == (2, total)
        assert wav.shape == (2, total)
        cond = wt.upsample_cond(params, cfg, mel, hop, total)
        _, want = wt.generate_fast(
            params, cfg, key, total, temperature=0.0, cond=cond,
            first_samples=jnp.full((2, 1), cfg.classes // 2, jnp.int32),
        )
        np.testing.assert_array_equal(np.asarray(cls), np.asarray(want))

    # single-stream (F, M) mel and explicit num_samples both work
    wav1, cls1 = wt.synthesize(
        params, cfg, key, mel[0], hop, temperature=0.0, num_samples=30
    )
    assert cls1.shape == (1, 30)
    np.testing.assert_array_equal(np.asarray(cls1[0]), np.asarray(cls[0, :30]))

    # channel mismatch is a hard error
    with pytest.raises(ValueError):
        wt.synthesize(params, cfg, key, mel[..., :3], hop)


def test_global_conditioning():
    """Speaker-embedding-style global conditioning: affects output, is
    broadcast over time, and fast == naive under it."""
    cfg = wt.get_config("tiny", gcond_channels=4)
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    assert wt.parameter_count(params) == cfg.parameter_count()

    x = jax.random.randint(jax.random.PRNGKey(1), (2, cfg.item_length), 0, cfg.classes)
    g1 = jax.random.normal(jax.random.PRNGKey(2), (2, 4))
    y0 = wt.wavenet_logits(params, cfg, x)
    y1 = wt.wavenet_logits(params, cfg, x, global_cond=g1)
    assert np.abs(np.asarray(y0) - np.asarray(y1)).max() > 1e-4
    np.testing.assert_allclose(
        np.asarray(y0),
        np.asarray(wt.wavenet_logits(params, cfg, x, global_cond=jnp.zeros((2, 4)))),
        atol=1e-5,
    )

    prime = jax.random.randint(
        jax.random.PRNGKey(3), (2, cfg.receptive_field), 0, cfg.classes
    )
    k = jax.random.PRNGKey(4)
    _, cf = wt.generate_fast(params, cfg, k, 20, prime, temperature=0.0,
                             global_cond=g1)
    _, cn = wt.generate(params, cfg, k, 20, prime, temperature=0.0,
                        global_cond=g1)
    np.testing.assert_array_equal(np.asarray(cf), np.asarray(cn))
    _, cu = wt.generate_fast(params, cfg, k, 20, prime, temperature=0.0)
    assert not np.array_equal(np.asarray(cf), np.asarray(cu))


def test_expand_frames_window_chunk_invariant():
    """The serving pool's frames expansion (ops/mel.py
    expand_frames_window) is bitwise CHUNK-INVARIANT: expanding rows
    [off, off+count) from a per-lane slab equals the same rows of the
    full-timeline expansion, for any offset/chunk decomposition. Linear
    interpolation is bitwise (integer phase arithmetic); the learnable
    conv stack's per-row values are shape-independent math but XLA may
    reassociate its einsums differently per slab length, so that path is
    pinned at ulp tolerance. This is what lets requests ship mel frames
    over the wire without breaking the batcher's solo-equality
    guarantee."""
    from pytorch_wavenet_tpu.ops.mel import (
        expand_frames_window, frames_window_len, linear_init_upsampler)

    rng = np.random.default_rng(7)
    hop, M, F = 8, 5, 40
    frames = rng.normal(0, 1, (F, M)).astype(np.float32)
    total = F * hop

    for tag, params, factors in [
        ("linear", None, ()),
        ("conv-lin-init",
         {"cond_up": {k: jnp.asarray(v) for k, v in
                      linear_init_upsampler((2, 4), M).items()}}, (2, 4)),
        ("conv-random",
         {"cond_up": {
             "s0": jnp.asarray(rng.normal(0, 0.5, (2, 2, M, M)),
                               jnp.float32),
             "s1": jnp.asarray(rng.normal(0, 0.5, (2, 4, M, M)),
                               jnp.float32)}}, (2, 4)),
    ]:
        # reference: frame-replication end semantics (the extension keeps
        # the conv stack's stage clamps out of the compared rows)
        ext = np.concatenate(
            [frames, np.repeat(frames[-1:], len(factors) + 1, axis=0)])
        full = np.asarray(expand_frames_window(
            params, jnp.asarray(ext)[None], hop,
            jnp.zeros(1, jnp.int32), total, factors))[0]
        for off, count in [(0, 16), (3, 16), (13, 7), (off0 := hop - 1, 1),
                           (250, 24), (total - 24, 24)]:
            Fs = frames_window_len(count, hop, factors)
            fs = off // hop
            idx = np.minimum(fs + np.arange(Fs), F - 1)
            got = np.asarray(expand_frames_window(
                params, jnp.asarray(frames[idx])[None], hop,
                jnp.asarray([off - fs * hop], jnp.int32), count,
                factors))[0]
            if factors:
                np.testing.assert_allclose(
                    got, full[off:off + count], atol=2e-6, rtol=1e-6,
                    err_msg=f"{tag} off={off} count={count}")
            else:
                np.testing.assert_array_equal(
                    got, full[off:off + count],
                    err_msg=f"{tag} off={off} count={count}")
