"""Training loop.

Capability parity with the reference trainer (reference:
wavenet_training.py:20-114): Adam with optional weight decay and gradient
clipping, shuffled mini-batches, cross-entropy on the flattened logits,
cadenced logging/validation/async-generation hooks, periodic snapshots, and
step-offset resume.

TPU-first differences:

* the train step is one donated, jitted function — forward, loss, backward,
  and the optimizer update fuse into a single XLA executable; under a mesh
  (``parallel.training``) the same step runs data/model-parallel with ICI
  allreduce instead of a single device;
* snapshots carry params + optimizer state + step (the reference pickles the
  module only, losing Adam moments on resume — wavenet_training.py:84-88);
* average step time is tracked continuously (the reference prints a single
  estimate at step 100, wavenet_training.py:79-82).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import WaveNetConfig
from ..models.wavenet import wavenet_logits
from ..utils.logging import Logger
from ..utils import checkpoints
from ..data.dataset import BatchIterator, PrefetchBatchIterator, WaveNetDataset
from .optimizers import reference_adam


def _expand_cond(params, cfg, cond, cond_hop: int | None, T: int):
    """Mel frames -> per-sample rows inside jit. The input pipeline ships
    cond at frame resolution (B, F, M) when it can (hop_length x less
    host->device transfer — the scarce resource through the device tunnel);
    a cond already at (B, T, M) passes through untouched. When the config
    carries a learnable upsampler (cfg.cond_upsample) the expansion runs
    through its transposed-conv stack, so its weights train with the rest
    of the model."""
    if cond is None or cond.shape[1] == T:
        return cond
    if cond_hop is None:
        raise ValueError(
            f"cond has {cond.shape[1]} rows for {T} samples but no cond_hop "
            "was given to upsample it"
        )
    from ..models.wavenet import upsample_cond

    return upsample_cond(params, cfg, cond, cond_hop, T)


def cross_entropy_loss(
    params: Any, cfg: WaveNetConfig, x: jnp.ndarray, target: jnp.ndarray,
    cond: jnp.ndarray | None = None, cond_hop: int | None = None,
    mesh=None,
) -> jnp.ndarray:
    """Mean softmax cross-entropy over the flattened (N*output_length)
    predictions (reference: wavenet_training.py:68-69). ``cond`` enables the
    mel-conditioned vocoder objective — per-sample rows (N, T, M) or frames
    (N, F, M) plus ``cond_hop``. ``mesh``: required for the fused-trunk
    (``cfg.trunk_kernel``) path under multi-chip sharding — see
    :func:`~pytorch_wavenet_tpu.models.wavenet.wavenet_logits`."""
    cond = _expand_cond(params, cfg, cond, cond_hop, x.shape[1])
    logits = wavenet_logits(params, cfg, x, cfg.output_length, cond=cond,
                            mesh=mesh)
    # same value as optax.softmax_cross_entropy_with_integer_labels, but
    # the label term is a one-hot contraction instead of take_along_axis:
    # a profiler trace showed the gather costing 0.21 ms/step at
    # chaconne_wide (6% of the step — it runs as a serial row gather, and
    # its transpose is a scatter); the dense select-sum fuses into the
    # surrounding elementwise passes
    logits32 = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits32, axis=-1)
    hit = jnp.sum(
        logits32 * jax.nn.one_hot(target, logits.shape[-1],
                                  dtype=jnp.float32),
        axis=-1,
    )
    return jnp.mean(logz - hit)


@partial(jax.jit, static_argnames=("cfg", "tx", "cond_hop", "mesh"),
         donate_argnums=(0, 1))
def train_step(params, opt_state, cfg: WaveNetConfig, tx, x, target, cond=None,
               cond_hop: int | None = None, mesh=None):
    """One fused optimization step. ``tx`` must be hashable (optax
    transforms built at trainer construction are reused across calls)."""
    loss, grads = jax.value_and_grad(cross_entropy_loss)(
        params, cfg, x, target, cond, cond_hop, mesh
    )
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    # grads stay on device; only fetched if the logger histograms them
    return params, opt_state, loss, grads


@partial(jax.jit, static_argnames=("cfg", "cond_hop", "mesh"))
def eval_step(params, cfg: WaveNetConfig, x, target, cond=None,
              cond_hop: int | None = None, mesh=None):
    """Loss + argmax-accuracy counts for validation
    (reference: wavenet_training.py:97-111)."""
    cond = _expand_cond(params, cfg, cond, cond_hop, x.shape[1])
    logits = wavenet_logits(params, cfg, x, cfg.output_length, cond=cond,
                            mesh=mesh)
    # intentionally keeps the optax formulation: eval is off the hot path,
    # and the gather it lowers to is irrelevant at validation cadence
    losses = optax.softmax_cross_entropy_with_integer_labels(logits, target)
    correct = jnp.sum(jnp.argmax(logits, axis=-1) == target)
    return jnp.mean(losses), correct


def _flatten_with_paths(tree, prefix=""):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = []
    for path, leaf in flat:
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        out.append((prefix + name, leaf))
    return out


class WaveNetTrainer:
    """Reference-shaped trainer (reference: wavenet_training.py:20-33)."""

    def __init__(
        self,
        cfg: WaveNetConfig,
        params: Any,
        dataset: WaveNetDataset,
        optimizer: optax.GradientTransformation | None = None,
        lr: float = 0.001,
        weight_decay: float = 0.0,
        gradient_clipping: float | None = None,
        logger: Logger | None = None,
        snapshot_path: str | None = None,
        snapshot_name: str = "snapshot",
        snapshot_interval: int = 1000,
        seed: int = 0,
        sync_every: int = 25,
        num_workers: int = 4,
        mesh=None,
    ):
        self.cfg = cfg
        # own a copy: train_step donates its params buffers, which would
        # otherwise invalidate the caller's pytree
        self.params = jax.tree_util.tree_map(lambda x: jnp.asarray(x).copy(), params)
        self.dataset = dataset
        self.tx = optimizer if optimizer is not None else reference_adam(
            lr, weight_decay, gradient_clipping
        )
        # mesh mode: params/opt sharded over ('data','model'); the same
        # jitted step and eval run data/model-parallel because sharding
        # comes from the operands (parallel/training.py design)
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from ..parallel.sharding import (
                batch_sharding, shard_opt_state, shard_params,
            )

            self.params = shard_params(self.params, cfg, mesh)
            self.opt_state = shard_opt_state(
                self.tx.init(self.params), self.params, mesh
            )
            self._batch_sharding = batch_sharding(mesh)
        else:
            self.opt_state = self.tx.init(params)
        self.logger = logger if logger is not None else Logger()
        self.logger.trainer = self  # inverted back-ref, reference:
        # wavenet_training.py:43 — validation is driven by logging cadence
        self.snapshot_path = snapshot_path
        self.snapshot_name = snapshot_name
        self.snapshot_interval = snapshot_interval
        self.seed = seed
        self.sync_every = sync_every
        self.num_workers = num_workers
        self.step = 0
        self.avg_step_time = None
        self._last_grads = None
        self._ckpt = checkpoints.AsyncCheckpointer()
        # frame-resolution conditioning (MelWaveNetDataset.device_upsample):
        # the step upsamples on device with this hop
        self._cond_hop = (
            getattr(dataset, "hop_length", None)
            if getattr(dataset, "device_upsample", False) else None
        )

    def _put(self, x):
        """Place a host batch: sharded over the data axis in mesh mode."""
        x = jnp.asarray(x)
        if self._batch_sharding is not None:
            x = jax.device_put(x, self._batch_sharding)
        return x

    # ------------------------------------------------------------ training

    def train(
        self,
        batch_size: int = 32,
        epochs: int = 10,
        continue_training_at_step: int = 0,
        max_steps: int | None = None,
    ):
        """reference: wavenet_training.py:50-90.

        Resume is deterministic: ``continue_training_at_step`` fast-forwards
        to the exact epoch and intra-epoch batch the run would have reached,
        so a resumed run consumes the same data stream as an uninterrupted
        one (the reference restarts its shuffle from scratch and re-consumes
        early batches, wavenet_training.py:50-60 — reproduced capability,
        not the flaw)."""
        self.step = continue_training_at_step
        step_t0 = None
        # prefetch overlaps host featurization (window gather; the full
        # mel pipeline for the vocoder) with device compute — the role
        # of the reference's DataLoader workers. Order is identical to
        # the plain iterator, so num_workers never changes training.
        it_cls = (
            partial(PrefetchBatchIterator, num_workers=self.num_workers)
            if self.num_workers > 0 else BatchIterator
        )
        steps_per_epoch = len(BatchIterator(self.dataset, batch_size))
        if steps_per_epoch == 0:
            raise ValueError(
                f"dataset of {len(self.dataset)} items yields no batches of "
                f"size {batch_size}"
            )
        start_epoch = continue_training_at_step // steps_per_epoch
        for current_epoch in range(start_epoch, epochs):
            print("epoch", current_epoch)
            skip = (
                continue_training_at_step - start_epoch * steps_per_epoch
                if current_epoch == start_epoch else 0
            )
            it = it_cls(
                self.dataset, batch_size, shuffle=True,
                seed=self.seed + current_epoch, skip_batches=skip,
            )
            for batch in it:
                x, target = self._put(batch[0]), self._put(batch[1])
                cond = self._put(batch[2]) if len(batch) > 2 else None
                self.params, self.opt_state, loss, self._last_grads = train_step(
                    self.params, self.opt_state, self.cfg, self.tx, x, target,
                    cond, self._cond_hop, self.mesh,
                )
                # loss stays a device scalar — converting here would sync
                # every step and pay the full dispatch round-trip latency;
                # the logger converts at its own cadence. A periodic sync
                # bounds the async dispatch queue (deep unsynced pipelines
                # have been observed to wedge the device transport).
                self.step += 1
                if self.step % self.sync_every == 0:
                    jax.block_until_ready(loss)

                now = time.time()
                if step_t0 is not None:
                    dt = now - step_t0
                    self.avg_step_time = (
                        dt if self.avg_step_time is None
                        else 0.95 * self.avg_step_time + 0.05 * dt
                    )
                step_t0 = now
                if self.step == continue_training_at_step + 100:
                    print(
                        "one training step does take approximately "
                        f"{self.avg_step_time} seconds"
                    )

                if (
                    self.snapshot_path is not None
                    and self.step % self.snapshot_interval == 0
                ):
                    self.snapshot()

                self.logger.log(self.step, loss)
                if max_steps is not None and self.step >= max_steps:
                    self._ckpt.wait()
                    return
        self._ckpt.wait()

    def snapshot(self, wait: bool = False) -> str:
        """Checkpoint params + optimizer state + step. The device fetch,
        serialization and write happen on a background thread (an on-device
        copy protects against the next step's buffer donation); pass
        ``wait=True`` to block until the file is on disk."""
        path = checkpoints.checkpoint_path(
            self.snapshot_path, self.snapshot_name, self.step
        )
        self._ckpt.save(
            self.snapshot_path,
            self.snapshot_name,
            self.step,
            self.params,
            opt_state=self.opt_state,
            cfg=self.cfg,
        )
        if wait:
            self._ckpt.wait()
        return path

    def resume(self, location: str | None = None):
        """Load the newest snapshot (params + optimizer state + step) and
        continue from there — exact resume, unlike the reference's
        module-only pickle (wavenet_model.py:330-340)."""
        blob = checkpoints.load_latest_model_from(
            location or self.snapshot_path, opt_state_template=self.opt_state
        )
        self.params = jax.tree_util.tree_map(jnp.asarray, blob["params"])
        if blob["opt_state"] is not None:
            self.opt_state = jax.tree_util.tree_map(jnp.asarray, blob["opt_state"])
        if self.mesh is not None:
            from ..parallel.sharding import shard_opt_state, shard_params

            self.params = shard_params(self.params, self.cfg, self.mesh)
            if blob["opt_state"] is None:
                self.opt_state = self.tx.init(self.params)
            self.opt_state = shard_opt_state(
                self.opt_state, self.params, self.mesh
            )
        self.step = blob["step"]
        return self.step

    # ---------------------------------------------------------- validation

    def validate(self, batch_size: int = 16):
        """Average loss and argmax accuracy over the test split
        (reference: wavenet_training.py:92-114). Uses a temporary test-mode
        view instead of mutating the shared dataset object.

        Mesh mode shards every evaluation batch over the data axis, so each
        test item is computed exactly once across the mesh (GSPMD reduces
        the per-shard loss mean and correct-count globally inside
        ``eval_step``); the ragged tail that can't fill all data shards is
        dropped there. Per-batch losses accumulate on device and sync once
        at the end — no per-batch host round-trip."""
        was_train = self.dataset.train
        self.dataset.train = False
        try:
            it = BatchIterator(self.dataset, batch_size, shuffle=False,
                               drop_last=self.mesh is not None)
            losses, correct = [], []
            seen = 0
            for batch in it:
                x, target = self._put(batch[0]), self._put(batch[1])
                cond = self._put(batch[2]) if len(batch) > 2 else None
                loss, c = eval_step(self.params, self.cfg, x, target, cond,
                                    self._cond_hop, self.mesh)
                losses.append(loss)
                correct.append(c)
                seen += target.size
            if not losses:
                return float("nan"), 0.0
            avg_loss = float(jnp.mean(jnp.stack(losses)))
            avg_accuracy = float(sum(correct)) / max(seen, 1)
        finally:
            self.dataset.train = was_train
        return avg_loss, avg_accuracy

    # ------------------------------------------------------- observability

    def named_parameters(self):
        return _flatten_with_paths(self.params)

    def named_gradients(self):
        """Most-recent gradients for histogram logging. Computed lazily on
        the latest params if no step has run (reference logs ``.grad``
        buffers, model_logging.py:79-83)."""
        if self._last_grads is None:
            return []
        return _flatten_with_paths(self._last_grads)


def generate_audio(params, cfg, length=8000, temperatures=(0.0, 1.0), seed=0):
    """Generate one clip per temperature (reference:
    wavenet_training.py:117-124). Returns (len(temperatures), length).

    All temperatures share ONE batched rollout (per-stream temperature
    lanes) instead of the reference's sequential loop — the logging-cadence
    audio hook costs one generation regardless of how many temperatures it
    logs."""
    from ..models.generate import generate_fast

    temps = jnp.asarray(list(temperatures), jnp.float32)
    first = jnp.full((temps.shape[0], 1), cfg.classes // 2, jnp.int32)
    wav, _ = generate_fast(
        params, cfg, jax.random.PRNGKey(seed), length, first,
        temperature=temps,
    )
    return np.asarray(wav)
