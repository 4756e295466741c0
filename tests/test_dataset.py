"""Data pipeline tests.

The adjacency invariants mirror the reference's live dataset tests
(reference: tests/test_audio_data.py:8-25): consecutive items' targets tile
the stream, and the last input sample of item k equals the last target
sample of item k-1's predecessor window.
"""

import numpy as np
import pytest

from pytorch_wavenet_tpu.data.audio_io import load_audio, write_wav, resample
from pytorch_wavenet_tpu.data.dataset import WaveNetDataset, BatchIterator
from pytorch_wavenet_tpu.ops.mulaw import quantize_data, dequantize_data


@pytest.fixture(scope="module")
def audio_dir(tmp_path_factory):
    """Two small synthetic wav files."""
    d = tmp_path_factory.mktemp("audio")
    rng = np.random.default_rng(0)
    t = np.arange(16000 * 2) / 16000.0
    wav1 = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.1 * rng.standard_normal(len(t))
    wav2 = 0.4 * np.sin(2 * np.pi * 440 * t[: len(t) // 2])
    write_wav(str(d / "a.wav"), np.clip(wav1, -1, 1), 16000)
    write_wav(str(d / "b.wav"), np.clip(wav2, -1, 1), 16000)
    return d


@pytest.fixture(scope="module")
def ds(audio_dir, tmp_path_factory):
    f = str(tmp_path_factory.mktemp("ds") / "dataset.npz")
    return WaveNetDataset(
        dataset_file=f,
        item_length=64,
        target_length=8,
        file_location=str(audio_dir),
        test_stride=10,
    )


def test_wav_roundtrip(tmp_path):
    x = 0.7 * np.sin(np.arange(4000) * 0.05).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 16000)
    y, sr = load_audio(p, sampling_rate=16000)
    assert sr == 16000
    assert len(y) == len(x)
    np.testing.assert_allclose(y, x, atol=1e-3)  # 16-bit quantization


def test_load_audio_resamples(tmp_path):
    x = np.sin(np.arange(8000) * 0.01).astype(np.float32)
    p = str(tmp_path / "t8k.wav")
    write_wav(p, x, 8000)
    y, sr = load_audio(p, sampling_rate=16000)
    assert sr == 16000
    assert abs(len(y) - 16000) <= 2


def test_resample_identity():
    x = np.arange(100, dtype=np.float32)
    assert resample(x, 16000, 16000) is x


def test_dataset_build_and_mmap(ds):
    # one npz with one array per audio file (reference: audio_data.py:77)
    assert len(ds.data.files) == 2
    assert len(ds) > 0
    x, y = ds[0]
    assert x.shape == (64,) and y.shape == (8,)
    assert x.dtype == np.int64
    assert x.min() >= 0 and x.max() < 256


def test_dataset_quantization_matches_codec(ds, audio_dir):
    wav, _ = load_audio(str(audio_dir / "a.wav"), 16000)
    q = quantize_data(wav, 256)
    np.testing.assert_array_equal(np.asarray(ds.data["arr_0"]), q.astype(np.uint8))


def test_window_adjacency(ds):
    """Consecutive train items tile the stream by target_length
    (reference invariant: tests/test_audio_data.py:20-25)."""
    x0, y0 = ds[0]
    x1, y1 = ds[1]
    # item 1's window starts target_length samples after item 0's
    np.testing.assert_array_equal(x1[: 64 - 8], x0[8:])
    # targets are the last target_length input samples shifted by one:
    # target[t] = input[t+1] within the same window
    np.testing.assert_array_equal(y0[:-1], x0[-8 + 1 :])


def test_train_test_interleave(ds):
    """Every test_stride-th item belongs to the test split; train and test
    lengths add up (reference: audio_data.py:91-97,125-130)."""
    n_train = len(ds)
    ds.train = False
    n_test = len(ds)
    xt, yt = ds[0]
    ds.train = True
    assert n_test == ds._length // ds._test_stride
    assert n_train == ds._length - n_test
    # test item 0 sits at sample index test_stride*1 - 1
    assert xt.shape == (64,)


def test_cross_file_stitch(ds):
    """Windows spanning the file boundary concatenate both files
    (reference: audio_data.py:107-117)."""
    import math

    boundary = ds.start_samples[1]
    # find a train item whose window crosses the boundary (same index math
    # as __getitem__)
    idx = next(
        i
        for i in range(len(ds))
        if (si := i * ds.target_length + math.floor(i / (ds._test_stride - 1)))
        < boundary
        < si + ds._item_length + 1
    )
    x, y = ds[idx]
    assert x.shape == (64,)
    assert np.isfinite(x).all()
    # the stitched window agrees with the concatenated quantized streams
    si = idx * ds.target_length + math.floor(idx / (ds._test_stride - 1))
    full = np.concatenate([np.asarray(ds.data["arr_0"]), np.asarray(ds.data["arr_1"])])
    np.testing.assert_array_equal(x, full[si : si + 64])


def test_batch_iterator(ds):
    it = BatchIterator(ds, batch_size=4, seed=1)
    x, y = next(iter(it))
    assert x.shape == (4, 64) and y.shape == (4, 8)
    assert x.dtype == np.int32
    assert len(it) == len(ds) // 4
    # reproducible shuffling
    x2, _ = next(iter(BatchIterator(ds, batch_size=4, seed=1)))
    np.testing.assert_array_equal(x, x2)
    x3, _ = next(iter(BatchIterator(ds, batch_size=4, seed=2)))
    assert not np.array_equal(x, x3)


def test_get_batch_matches_getitem(ds):
    """The native batched gather must agree with the per-item path
    (including the train/test interleave offsets)."""
    idxs = [0, 1, 5, len(ds) - 1]
    xb, yb = ds.get_batch(idxs)
    for row, i in enumerate(idxs):
        x, y = ds[i]
        np.testing.assert_array_equal(xb[row], x)
        np.testing.assert_array_equal(yb[row], y)
    ds.train = False
    try:
        xb, yb = ds.get_batch([0, 1])
        for row, i in enumerate([0, 1]):
            x, y = ds[i]
            np.testing.assert_array_equal(xb[row], x)
            np.testing.assert_array_equal(yb[row], y)
    finally:
        ds.train = True


def test_dataset_reload_from_npz(ds, tmp_path):
    """Second construction must reuse the npz without file_location
    (reference: audio_data.py:37-54)."""
    ds2 = WaveNetDataset(
        dataset_file=ds.dataset_file, item_length=64, target_length=8,
        test_stride=10,
    )
    x, y = ds2[3]
    xo, yo = ds[3]
    np.testing.assert_array_equal(x, xo)


def test_prefetch_iterator_matches_plain(ds):
    """PrefetchBatchIterator must yield byte-identical batches in the same
    order as BatchIterator for the same seed."""
    from pytorch_wavenet_tpu.data.dataset import PrefetchBatchIterator

    plain = list(BatchIterator(ds, batch_size=4, seed=7))
    pre = list(PrefetchBatchIterator(ds, batch_size=4, seed=7,
                                     num_workers=3, depth=2))
    assert len(plain) == len(pre) > 0
    for (xa, ya), (xb, yb) in zip(plain, pre):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)


def test_prefetch_iterator_early_abandon(ds):
    """Abandoning iteration mid-epoch must not hang the worker pool."""
    from pytorch_wavenet_tpu.data.dataset import PrefetchBatchIterator

    it = iter(PrefetchBatchIterator(ds, batch_size=4, num_workers=2, depth=2))
    next(it)
    del it  # generator close -> pool shutdown without deadlock


def test_flat_stream_cache_rebuilt_when_stale(ds):
    """The on-disk flat cache regenerates if its size no longer matches."""
    import os

    orig = np.asarray(ds.flat_stream).copy()
    ds._flat = None  # drop the old mapping before mutating the file
    cache = ds.dataset_file + ".flat"
    assert os.path.getsize(cache) == orig.shape[0]
    with open(cache, "wb") as f:
        f.write(b"xx")
    np.testing.assert_array_equal(np.asarray(ds.flat_stream), orig)


def _has_any_mp3_decoder():
    import importlib.util
    import shutil

    return (
        importlib.util.find_spec("librosa") is not None
        or importlib.util.find_spec("soundfile") is not None
        or shutil.which("ffmpeg") is not None
    )


def test_mp3_error_names_every_backend(tmp_path):
    """Without any decoder, the error enumerates the fallback chain
    (librosa -> soundfile -> ffmpeg) and the remedies."""
    if _has_any_mp3_decoder():
        pytest.skip("a decoder exists in this image; error path unreachable")
    p = tmp_path / "x.mp3"
    p.write_bytes(b"\xff\xfb\x90\x00" + b"\x00" * 64)
    with pytest.raises(ValueError) as ei:
        load_audio(str(p))
    msg = str(ei.value)
    assert "librosa" in msg and "soundfile" in msg and "ffmpeg" in msg


@pytest.mark.skipif(not _has_any_mp3_decoder(), reason="no mp3 decoder in image")
def test_mp3_decodes_through_fallback_chain(tmp_path):
    """With any backend present, an mp3 fixture decodes to a mono waveform
    at the requested rate (reference capability: audio_data.py:69-71)."""
    import shutil
    import subprocess

    p = tmp_path / "tone.mp3"
    if shutil.which("ffmpeg"):
        wav = tmp_path / "tone.wav"
        t = np.arange(8000) / 16000.0
        write_wav(str(wav), 0.5 * np.sin(2 * np.pi * 440 * t), 16000)
        subprocess.run(["ffmpeg", "-v", "error", "-i", str(wav), str(p)],
                       check=True)
    else:
        pytest.skip("cannot author an mp3 fixture without ffmpeg")
    y, sr = load_audio(str(p), sampling_rate=16000)
    assert sr == 16000 and y.ndim == 1 and len(y) > 4000
    assert np.abs(y).max() > 0.1
