"""Window dataset over mu-law-quantized audio.

Capability parity with the reference dataset (reference: audio_data.py:12-130):
directory -> one ``.npz`` of per-file uint8 class arrays built on first use,
then mmap-served fixed-length windows with the same index math — including
the every-``test_stride``-th-item train/test interleave and cross-file window
stitching.

TPU-first differences:

* items are integer class windows ``(item_length+1,)`` — the one-hot scatter
  the reference does per item on the host (audio_data.py:119-123) becomes an
  embedding-row gather on device, so the host->device transfer is 1 byte per
  sample instead of ``classes`` floats;
* batching is a simple reproducible numpy iterator (plus a sharded variant in
  ``parallel``) rather than worker processes — the featurized data is already
  a flat mmap, so "loading" is a memcpy, not decode work;
* the featurizer parallelizes across files with a thread pool and can use the
  native C++ codec when built (``pytorch_wavenet_tpu.data.native``).
"""

from __future__ import annotations

import math
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..ops.mulaw import quantize_data
from .audio_io import list_all_audio_files, load_audio, normalize


class WaveNetDataset:
    """Drop-in analogue of the reference ``WavenetDataset``
    (reference: audio_data.py:12-130). Constructor signature and semantics
    match; items are integer windows instead of one-hot tensors.

    Windowing model: the featurized files form one logical byte stream.
    Item ``i`` is the ``item_length + 1`` consecutive classes starting at
    ``window_start(i)``; the first ``item_length`` are the model input and
    the last ``target_length`` are the targets (input and target overlap by
    ``target_length - 1`` — teacher forcing predicts each target from the
    bytes before it). Successive items advance by ``target_length``, so
    train targets tile the stream; every ``test_stride``-th window is
    reserved for the test split. Rather than stitching windows out of the
    per-file npz arrays, the stream is materialized once as a flat on-disk
    cache and every window — batched or single — is one contiguous slice
    of it.
    """

    def __init__(
        self,
        dataset_file: str,
        item_length: int,
        target_length: int,
        file_location: str | None = None,
        classes: int = 256,
        sampling_rate: int = 16000,
        mono: bool = True,
        normalize: bool = False,
        dtype=np.uint8,
        train: bool = True,
        test_stride: int = 100,
    ):
        self.dataset_file = dataset_file
        self._item_length = item_length
        self._test_stride = test_stride
        self.target_length = target_length
        self.classes = classes
        self.sampling_rate = sampling_rate
        self.mono = mono
        self.normalize = normalize
        self.dtype = dtype

        if not os.path.isfile(dataset_file):
            assert file_location is not None, "no location for dataset files specified"
            self.create_dataset(file_location, dataset_file)

        self.data = np.load(self.dataset_file, mmap_mode="r")
        self.start_samples: list[int] = [0]
        self._length = 0
        self.calculate_length()
        self.train = train
        self._flat: np.ndarray | None = None

    # ------------------------------------------------------------ featurize

    def _featurize_one(self, file: str) -> np.ndarray:
        from . import native

        file_data, _ = load_audio(
            file, sampling_rate=self.sampling_rate, mono=self.mono
        )
        if self.normalize:
            file_data = normalize(file_data)
        if self.dtype == np.uint8 and native.available():
            return native.mu_law_quantize(file_data, self.classes)
        return quantize_data(file_data, self.classes).astype(self.dtype)

    def create_dataset(self, location: str, out_file: str, num_workers: int = 8):
        """Walk ``location``, mu-law quantize every audio file, save one npz
        (reference: audio_data.py:62-77). Files are featurized concurrently."""
        print("create dataset from audio files at", location)
        self.dataset_file = out_file
        files = list_all_audio_files(location)
        done = [0]

        def work(f):
            q = self._featurize_one(f)
            done[0] += 1
            print(f"  processed {done[0]} of {len(files)} files")
            return q

        with ThreadPoolExecutor(max_workers=num_workers) as ex:
            processed = list(ex.map(work, files))
        np.savez(out_file, *processed)

    # ------------------------------------------------------------- indexing

    def calculate_length(self):
        """Rebuild the stream geometry: per-file cumulative offsets and how
        many full (input, target) windows fit. A window consumes
        ``item_length + 1`` bytes but successive windows overlap all except
        ``target_length`` of them, so after discarding the warm-up prefix
        that can never be a target, the stream yields one window per
        ``target_length`` bytes. Window counts and placement agree with the
        reference by construction (pinned by tests/test_dataset.py)."""
        sizes = [len(self.data["arr_" + str(i)]) for i in range(len(self.data.files))]
        self.start_samples = [0] + list(np.cumsum(sizes))
        total = self.start_samples[-1]
        usable = total - (self._item_length - (self.target_length - 1)) - 1
        self._length = usable // self.target_length

    def set_item_length(self, l):
        self._item_length = l
        self.calculate_length()

    def sample_index(self, idx: int) -> int:
        """Split-local item index -> byte offset of its window in the
        stream. Train windows advance by ``target_length`` and additionally
        creep forward one byte per ``test_stride - 1`` items consumed; test
        windows sit at the fixed byte offsets ``k * test_stride - 1``. This
        exact interleave is observable behavior a reference user depends on
        (which item maps to which audio), so the arithmetic is pinned, odd
        as it is — the test split covers far less of the stream than
        1/test_stride of it (tests/test_dataset.py asserts both mappings)."""
        if self._test_stride < 2:
            return idx * self.target_length
        if self.train:
            return idx * self.target_length + idx // (self._test_stride - 1)
        return self._test_stride * (idx + 1) - 1

    @property
    def flat_stream(self) -> np.ndarray:
        """The concatenated class stream, memory-mapped from a one-time
        on-disk cache next to the npz (1 byte/sample; no per-access stitch
        work, no RAM residency requirement)."""
        if self._flat is None:
            cache = self.dataset_file + ".flat"
            total = self.start_samples[-1]
            if not os.path.isfile(cache) or os.path.getsize(cache) != total:
                tmp = cache + ".tmp"
                with open(tmp, "wb") as f:
                    for i in range(len(self.data.files)):
                        np.asarray(self.data["arr_" + str(i)], np.uint8).tofile(f)
                os.replace(tmp, cache)
            self._flat = np.memmap(cache, np.uint8, mode="r", shape=(total,))
        return self._flat

    def get_batch(self, idxs) -> tuple[np.ndarray, np.ndarray]:
        """Gather a whole batch of windows in one native call
        (int32 ``(B, item_length)``, ``(B, target_length)``)."""
        from . import native

        starts = np.asarray([self.sample_index(int(i)) for i in idxs], np.int64)
        return native.gather_windows(
            self.flat_stream, starts, self._item_length, self.target_length
        )

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        """Return ``(input_classes (item_length,), target (target_length,))``
        int64 windows: one contiguous slice of the flat stream."""
        start = self.sample_index(idx)
        stop = start + self._item_length + 1
        stream = self.flat_stream
        if stop > stream.shape[0]:
            raise IndexError(
                f"window [{start}, {stop}) exceeds the {stream.shape[0]}-byte stream"
            )
        window = np.asarray(stream[start:stop], dtype=np.int64)
        return window[: self._item_length], window[-self.target_length :]

    def __len__(self) -> int:
        """Size of the active split: every ``test_stride``-th window is
        test, the rest train (reference semantics: audio_data.py:125-130)."""
        n_test = self._length // self._test_stride
        return self._length - n_test if self.train else n_test


class BatchIterator:
    """Shuffled mini-batch iterator over a :class:`WaveNetDataset`.

    Replaces the reference's ``DataLoader(shuffle=True, num_workers=8)``
    (reference: wavenet_training.py:55-59). Items here are byte windows out
    of an mmap — gathering a batch is bandwidth-trivial, so this is a plain
    reproducible numpy loop; multi-host sharding lives in
    ``parallel.data_sharding``.
    """

    def __init__(
        self,
        dataset: WaveNetDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        skip_batches: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        # resume fast-forward: reproduce the epoch's permutation but start
        # mid-stream without featurizing the already-consumed batches
        self.skip_batches = skip_batches
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        total = n // self.batch_size if self.drop_last else math.ceil(n / self.batch_size)
        return max(total - self.skip_batches, 0)

    def _batch_indices(self):
        n = len(self.dataset)
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        out = []
        for i in range(0, n, self.batch_size):
            idxs = order[i : i + self.batch_size]
            if self.drop_last and len(idxs) < self.batch_size:
                break
            out.append(idxs)
        return out[self.skip_batches :]

    def __iter__(self):
        for idxs in self._batch_indices():
            yield self.dataset.get_batch(idxs)


class PrefetchBatchIterator(BatchIterator):
    """A :class:`BatchIterator` whose ``get_batch`` calls run on a worker
    pool ahead of consumption, so host featurization (window gather, and for
    the vocoder the whole mel pipeline) overlaps device compute — the role
    of the reference's ``DataLoader(num_workers=8)``
    (reference: wavenet_training.py:55-59) without its process boundary.

    ``depth`` bounds how many batches may be in flight: memory stays
    bounded and a slow consumer backpressures the workers. Batch order is
    identical to the plain iterator (futures are consumed in submission
    order), so swapping iterators never changes what the model sees.
    """

    def __init__(self, *args, num_workers: int = 4, depth: int = 8, **kwargs):
        super().__init__(*args, **kwargs)
        self.num_workers = num_workers
        self.depth = max(depth, 1)

    def __iter__(self):
        batches = self._batch_indices()
        if not batches:
            return
        self.dataset.flat_stream  # materialize the cache before fan-out
        with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
            pending = []
            it = iter(batches)
            for idxs in it:
                pending.append(ex.submit(self.dataset.get_batch, idxs))
                if len(pending) >= self.depth:
                    break
            for idxs in it:
                yield pending.pop(0).result()
                pending.append(ex.submit(self.dataset.get_batch, idxs))
            for fut in pending:
                yield fut.result()
