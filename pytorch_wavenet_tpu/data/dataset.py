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

import bisect
import math
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..ops.mulaw import quantize_data
from .audio_io import list_all_audio_files, load_audio, normalize


class WaveNetDataset:
    """Drop-in analogue of the reference ``WavenetDataset``
    (reference: audio_data.py:12-130). Constructor signature and semantics
    match; items are integer windows instead of one-hot tensors."""

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
        #           |----receptive_field----|
        #                                 |--output_length--|
        # example:  | | | | | | | | | | | | | | | | | | | | |
        # target:                           | | | | | | | | | |
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
        """Cumulative per-file offsets + usable item count
        (reference: audio_data.py:79-85)."""
        start_samples = [0]
        for i in range(len(self.data.files)):
            start_samples.append(start_samples[-1] + len(self.data["arr_" + str(i)]))
        available_length = (
            start_samples[-1] - (self._item_length - (self.target_length - 1)) - 1
        )
        self._length = math.floor(available_length / self.target_length)
        self.start_samples = start_samples

    def set_item_length(self, l):
        self._item_length = l
        self.calculate_length()

    def sample_index(self, idx: int) -> int:
        """Item index -> absolute sample offset into the concatenated stream,
        including the train/test interleave (reference: audio_data.py:91-97)."""
        if self._test_stride < 2:
            return idx * self.target_length
        elif self.train:
            return idx * self.target_length + math.floor(
                idx / (self._test_stride - 1)
            )
        else:
            return self._test_stride * (idx + 1) - 1

    @property
    def flat_stream(self) -> np.ndarray:
        """All files concatenated into one flat uint8 class stream (built
        lazily; backs the native batched window gather)."""
        if self._flat is None:
            self._flat = np.concatenate(
                [np.asarray(self.data["arr_" + str(i)], np.uint8)
                 for i in range(len(self.data.files))]
            )
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
        int64 windows. Index math (test interleave + cross-file stitch)
        matches reference: audio_data.py:91-123."""
        sample_index = self.sample_index(idx)

        file_index = bisect.bisect_left(self.start_samples, sample_index) - 1
        if file_index < 0:
            file_index = 0
        if file_index + 1 >= len(self.start_samples):
            raise IndexError(
                f"sample index {sample_index} is too high (file_index {file_index})"
            )
        position_in_file = sample_index - self.start_samples[file_index]
        end_position_in_next_file = (
            sample_index + self._item_length + 1 - self.start_samples[file_index + 1]
        )

        if end_position_in_next_file < 0:
            this_file = self.data["arr_" + str(file_index)]
            sample = this_file[
                position_in_file : position_in_file + self._item_length + 1
            ]
        else:  # stitch across adjacent files
            file1 = self.data["arr_" + str(file_index)]
            file2 = self.data["arr_" + str(file_index + 1)]
            sample = np.concatenate(
                (file1[position_in_file:], file2[:end_position_in_next_file])
            )

        example = np.asarray(sample, dtype=np.int64)
        return example[: self._item_length], example[-self.target_length :]

    def __len__(self) -> int:
        """Train/test split sizes (reference: audio_data.py:125-130)."""
        test_length = math.floor(self._length / self._test_stride)
        if self.train:
            return self._length - test_length
        else:
            return test_length


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
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else math.ceil(n / self.batch_size)

    def __iter__(self):
        n = len(self.dataset)
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        for i in range(0, n, self.batch_size):
            idxs = order[i : i + self.batch_size]
            if self.drop_last and len(idxs) < self.batch_size:
                return
            yield self.dataset.get_batch(idxs)
