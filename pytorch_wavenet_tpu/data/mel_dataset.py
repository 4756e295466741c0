"""Mel-conditioned vocoder dataset.

Wraps :class:`WaveNetDataset` so each batch also carries per-sample log-mel
conditioning features computed from the (dequantized) window audio —
BASELINE.json config 5's "mel-conditioned vocoder" training input. The
reference has no conditioning path; this is the capability its WaveNet
lineage implies for vocoder deployment.
"""

from __future__ import annotations

import numpy as np

from ..ops.mel import log_mel_spectrogram, upsample_frames_np
from .dataset import WaveNetDataset
from . import native


class MelWaveNetDataset(WaveNetDataset):
    """Batches are ``(x (B, item_length) int32, y (B, target_length) int32,
    cond float32)`` where cond is mel frames ``(B, F, num_mels)`` by default
    (``device_upsample`` — the trainer interpolates to per-sample rows on
    device) or upsampled rows ``(B, item_length, num_mels)`` with
    ``device_upsample=False``."""

    def __init__(
        self,
        *args,
        num_mels: int = 80,
        n_fft: int = 1024,
        hop_length: int = 256,
        device_upsample: bool = True,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.num_mels = num_mels
        self.n_fft = n_fft
        self.hop_length = hop_length
        # Ship mel FRAMES (B, F, M) and let the jitted train step upsample
        # to per-sample resolution on device: the host->device transfer per
        # batch drops by ~hop_length x (e.g. 10.5 MB -> 43 KB for the
        # vocoder config — measured 239 -> ~8 ms/step through the axon
        # tunnel, where transfer bandwidth is the scarce resource).
        # device_upsample=False restores per-sample-resolution cond rows.
        self.device_upsample = device_upsample

    def _mel_for_windows(self, x: np.ndarray) -> np.ndarray:
        """(B, T) int classes -> (B, T, num_mels) upsampled log-mel.

        Whole-batch host numpy: one dequantize, one vectorized STFT+matmul,
        one interpolation — no device dispatch. (The round-1 version looped
        per item and round-tripped jnp per item: ~0.4 s of dispatch per B=16
        batch against a ~4 ms train step.)"""
        B, T = x.shape
        wav = native.mu_law_dequantize(x.astype(np.uint8), self.classes)
        frames = log_mel_spectrogram(
            wav,
            num_mels=self.num_mels,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            sampling_rate=self.sampling_rate or 16000,
        )
        if self.device_upsample:
            return frames  # (B, F, M): the train step interpolates on device
        return upsample_frames_np(frames, self.hop_length, T)

    def get_batch(self, idxs):
        x, y = super().get_batch(idxs)
        return x, y, self._mel_for_windows(x)

    def __getitem__(self, idx):
        x, y = super().__getitem__(idx)
        cond = self._mel_for_windows(x[None, :].astype(np.int32))[0]
        return x, y, cond
