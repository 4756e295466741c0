"""Training observability.

Reproduces the reference's two-tier logger (reference: model_logging.py:12-163):
cadenced hooks driven off the training step — windowed average loss every
``log_interval``, validation every ``validation_interval``, and asynchronous
audio generation every ``generate_interval`` on a daemon thread with a
skip-if-still-running guard (reference: model_logging.py:48-58). The
inverted trainer back-reference (``logger.trainer``) is kept so validation is
driven from the logging cadence (reference: wavenet_training.py:43,
model_logging.py:34-35,43-46).

``TensorboardLogger`` writes real TensorBoard event files through the
dependency-free writer in :mod:`pytorch_wavenet_tpu.utils.tensorboard`
(the reference needs the full tensorflow package for this,
model_logging.py:1,71).
"""

from __future__ import annotations

import threading
from typing import Callable

import numpy as np


class Logger:
    def __init__(
        self,
        log_interval: int = 50,
        validation_interval: int = 200,
        generate_interval: int = 500,
        trainer=None,
        generate_function: Callable | None = None,
    ):
        self.trainer = trainer
        self.log_interval = log_interval
        self.validation_interval = validation_interval
        self.generate_interval = generate_interval
        self.accumulated_loss = 0.0
        self.generate_function = generate_function
        self.generate_thread: threading.Thread | None = None

    def log(self, current_step: int, current_loss):
        """Per-step hook (reference: model_logging.py:29-37). ``current_loss``
        may be a device scalar; it is only converted to a host float at the
        log cadence, keeping the training loop free of per-step syncs."""
        self.accumulated_loss = self.accumulated_loss + current_loss
        if current_step % self.log_interval == 0:
            self.log_loss(current_step)
            self.accumulated_loss = 0.0
        if current_step % self.validation_interval == 0:
            self.validate(current_step)
        if current_step % self.generate_interval == 0:
            self.generate(current_step)

    def log_loss(self, current_step: int):
        avg_loss = float(self.accumulated_loss) / self.log_interval
        print(f"loss at step {current_step}: {avg_loss}")

    def validate(self, current_step: int):
        if self.trainer is None:
            return
        avg_loss, avg_accuracy = self.trainer.validate()
        print(f"validation loss: {avg_loss}")
        print(f"validation accuracy: {avg_accuracy * 100}%")

    def generate(self, current_step: int):
        """Spawn the audio-generation callback on a daemon thread, skipping
        if the previous one is still running (reference:
        model_logging.py:48-58)."""
        if self.generate_function is None:
            return
        if self.generate_thread is not None and self.generate_thread.is_alive():
            print("Last generate is still running, skipping this one")
            return
        self.generate_thread = threading.Thread(
            target=self.generate_function, args=[current_step], daemon=True
        )
        self.generate_thread.start()


class TensorboardLogger(Logger):
    """TB-event logger (reference: model_logging.py:62-163): scalars,
    per-parameter and per-gradient histograms, audio clips."""

    def __init__(
        self,
        log_interval: int = 50,
        validation_interval: int = 200,
        generate_interval: int = 500,
        trainer=None,
        generate_function: Callable | None = None,
        log_dir: str = "logs",
        log_histograms: bool = True,
    ):
        super().__init__(
            log_interval, validation_interval, generate_interval, trainer,
            generate_function,
        )
        from .tensorboard import SummaryWriter

        self.writer = SummaryWriter(log_dir)
        self.log_histograms = log_histograms

    def log_loss(self, current_step: int):
        avg_loss = float(self.accumulated_loss) / self.log_interval
        self.scalar_summary("loss", avg_loss, current_step)
        if self.log_histograms and self.trainer is not None:
            # per-parameter and per-gradient histograms
            # (reference: model_logging.py:79-83)
            for tag, value in self.trainer.named_parameters():
                tag = tag.replace(".", "/")
                self.histo_summary(tag, np.asarray(value), current_step)
            for tag, grad in self.trainer.named_gradients():
                tag = tag.replace(".", "/")
                self.histo_summary(tag + "/grad", np.asarray(grad), current_step)

    def validate(self, current_step: int):
        if self.trainer is None:
            return
        avg_loss, avg_accuracy = self.trainer.validate()
        self.scalar_summary("validation loss", avg_loss, current_step)
        self.scalar_summary("validation accuracy", avg_accuracy, current_step)

    def log_audio(self, step: int):
        """Generate clips synchronously and write them as TB audio summaries
        (reference: model_logging.py:90-93). The generate_function signature
        is ``f(step)`` everywhere — the same callable the cadenced
        ``generate`` hook spawns on its daemon thread."""
        if self.generate_function is None:
            return
        samples = self.generate_function(step)
        if samples is not None:
            self.audio_summary("audio sample", samples, step, sr=16000)

    # thin pass-throughs matching the reference method surface
    # (reference: model_logging.py:95-157)
    def scalar_summary(self, tag, value, step):
        self.writer.add_scalar(tag, value, step)

    def histo_summary(self, tag, values, step, bins=200):
        self.writer.add_histogram(tag, values, step, bins=bins)

    def image_summary(self, tag, images, step):
        for i, img in enumerate(images):
            self.writer.add_image(f"{tag}/{i}", img, step)

    def audio_summary(self, tag, samples, step, sr=16000):
        samples = np.atleast_2d(np.asarray(samples))
        for i, clip in enumerate(samples):
            self.writer.add_audio(f"{tag}/{i}", clip, step, sample_rate=sr)

    def close(self):
        self.writer.close()
