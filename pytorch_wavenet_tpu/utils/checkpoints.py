"""Checkpointing.

The reference pickles the whole nn.Module with a timestamped name every
``snapshot_interval`` steps and reloads "latest" by file ctime (reference:
wavenet_training.py:84-88, wavenet_model.py:330-346); optimizer state is
lost on resume. Here a checkpoint is a self-describing msgpack blob holding
config JSON + params + optimizer state + step, so resume is exact, and
"latest" is chosen by (step, mtime). Writes are atomic (tmp + rename) so a
crash mid-save never corrupts the newest snapshot — the async-generation
thread reads these files while training writes them (reference behavior:
model_logging.py:48-58).

Multi-host discipline (SURVEY.md §5 "multi-host async save"): every process
participates in the device->host gather (sharded leaves may need a
collective), but only process 0 touches the filesystem — on a pod slice the
hosts usually share storage, and N processes racing one rename is a
last-writer-wins lottery. :func:`save_checkpoint_async` moves serialization
and the write off the training step entirely (see its donation-safety
note)."""

from __future__ import annotations

import concurrent.futures
import os
import time
from typing import Any

import jax
import numpy as np
from flax import serialization

from ..config import WaveNetConfig

CKPT_SUFFIX = ".ckpt"


def checkpoint_path(directory: str, name: str, step: int) -> str:
    return os.path.join(directory, f"{name}_{step:010d}{CKPT_SUFFIX}")


def _to_host(tree):
    """Device -> host numpy. Fully-addressable arrays (single process, any
    number of local devices) fetch directly; cross-process-sharded leaves
    are allgathered so every host holds the full value. COLLECTIVE under
    multi-process sharding: all processes must call this together."""

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree_util.tree_map(fetch, tree)


def save_checkpoint(
    directory: str,
    name: str,
    step: int,
    params: Any,
    opt_state: Any = None,
    cfg: WaveNetConfig | None = None,
    extra: dict | None = None,
) -> str:
    """Write ``{directory}/{name}_{step:010d}{CKPT_SUFFIX}`` atomically.

    Safe to call from every process of a multi-host run: the gather is
    collective, the file write happens on process 0 only (all processes
    return the would-be path)."""
    host_tree = {
        "params": _to_host(params),
        "opt_state": _to_host(opt_state) if opt_state is not None else None,
    }
    path = checkpoint_path(directory, name, step)
    if jax.process_index() != 0:
        return path
    os.makedirs(directory, exist_ok=True)
    blob = {
        "format": "pytorch_wavenet_tpu/1",
        "time": time.time(),
        "step": step,
        "config": cfg.to_json() if cfg is not None else None,
        "params": serialization.to_state_dict(host_tree["params"]),
        "opt_state": (
            serialization.to_state_dict(host_tree["opt_state"])
            if host_tree["opt_state"] is not None
            else None
        ),
        "extra": extra or {},
    }
    data = serialization.msgpack_serialize(blob)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


class AsyncCheckpointer:
    """Background checkpoint writer keeping the device fetch, serialization
    and file IO off the training step.

    Donation safety: the trainer's ``train_step`` donates its params and
    opt-state buffers, so a background thread must never read the live
    arrays — the next step would invalidate them mid-fetch. ``save()``
    therefore snapshots the trees with an on-device copy (an async-dispatch
    HBM->HBM memcpy, microseconds of step time) and hands only the copy to
    the worker thread. One save is in flight at a time; a newer save waits
    for the previous one (bounded memory, ordered files). NOT safe under
    cross-process sharding (process_allgather from a worker thread would
    need every host's thread to rendezvous) — pod-slice runs should call
    the synchronous ``save_checkpoint`` instead; here that case falls back
    to a blocking save."""

    def __init__(self):
        self._ex = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt"
        )
        self._pending: concurrent.futures.Future | None = None

    def save(self, directory, name, step, params, opt_state=None, cfg=None,
             extra=None) -> concurrent.futures.Future:
        self.wait()

        def fully_addressable(tree):
            return all(
                (not isinstance(x, jax.Array)) or x.is_fully_addressable
                for x in jax.tree_util.tree_leaves(tree)
            )

        if not (fully_addressable(params) and fully_addressable(opt_state)):
            f: concurrent.futures.Future = concurrent.futures.Future()
            f.set_result(
                save_checkpoint(directory, name, step, params, opt_state,
                                cfg, extra)
            )
            return f

        copy = lambda t: jax.tree_util.tree_map(jax.numpy.copy, t)
        params_c = copy(params)
        opt_c = copy(opt_state) if opt_state is not None else None
        self._pending = self._ex.submit(
            save_checkpoint, directory, name, step, params_c, opt_c, cfg, extra
        )
        return self._pending

    def wait(self) -> str | None:
        """Block until the in-flight save (if any) lands; returns its path."""
        if self._pending is None:
            return None
        path = self._pending.result()
        self._pending = None
        return path

    def close(self):
        self.wait()
        self._ex.shutdown(wait=True)


def load_checkpoint(path: str, opt_state_template: Any = None) -> dict:
    """Load a checkpoint file. Returns a dict with keys ``step``, ``config``
    (WaveNetConfig or None), ``params``, ``opt_state``, ``extra``."""
    with open(path, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    out = {
        "step": int(blob["step"]),
        "config": WaveNetConfig.from_json(blob["config"]) if blob["config"] else None,
        "params": blob["params"],
        "opt_state": None,
        "extra": blob.get("extra", {}),
    }
    if blob.get("opt_state") is not None:
        if opt_state_template is not None:
            out["opt_state"] = serialization.from_state_dict(
                opt_state_template, blob["opt_state"]
            )
        else:
            out["opt_state"] = blob["opt_state"]
    return out


def latest_checkpoint(location: str) -> str | None:
    """Newest checkpoint path by (step, mtime) (the reference picks by raw
    ctime over all files, wavenet_model.py:330-332)."""
    if not os.path.isdir(location):
        return None
    files = [
        os.path.join(location, f)
        for f in os.listdir(location)
        if f.endswith(CKPT_SUFFIX)
    ]
    if not files:
        return None

    def key(p):
        stem = os.path.basename(p)[: -len(CKPT_SUFFIX)]
        try:
            step = int(stem.rsplit("_", 1)[-1])
        except ValueError:
            step = -1
        return (step, os.path.getmtime(p))

    return max(files, key=key)


def load_latest_model_from(location: str, opt_state_template: Any = None) -> dict:
    """Reference API analogue (wavenet_model.py:330-340): load the newest
    checkpoint in ``location``."""
    path = latest_checkpoint(location)
    if path is None:
        raise FileNotFoundError(f"no checkpoints under {location}")
    print("load model " + path)
    return load_checkpoint(path, opt_state_template)
