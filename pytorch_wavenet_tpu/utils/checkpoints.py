"""Checkpointing.

The reference pickles the whole nn.Module with a timestamped name every
``snapshot_interval`` steps and reloads "latest" by file ctime (reference:
wavenet_training.py:84-88, wavenet_model.py:330-346); optimizer state is
lost on resume. Here a checkpoint is a self-describing msgpack blob holding
config JSON + params + optimizer state + step, so resume is exact, and
"latest" is chosen by (step, mtime). Writes are atomic (tmp + rename) so a
crash mid-save never corrupts the newest snapshot — the async-generation
thread reads these files while training writes them (reference behavior:
model_logging.py:48-58)."""

from __future__ import annotations

import os
import time
from typing import Any

import jax
import numpy as np
from flax import serialization

from ..config import WaveNetConfig

CKPT_SUFFIX = ".ckpt"


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    directory: str,
    name: str,
    step: int,
    params: Any,
    opt_state: Any = None,
    cfg: WaveNetConfig | None = None,
    extra: dict | None = None,
) -> str:
    """Write ``{directory}/{name}_{step:010d}{CKPT_SUFFIX}`` atomically."""
    os.makedirs(directory, exist_ok=True)
    blob = {
        "format": "pytorch_wavenet_tpu/1",
        "time": time.time(),
        "step": step,
        "config": cfg.to_json() if cfg is not None else None,
        "params": serialization.to_state_dict(_to_host(params)),
        "opt_state": (
            serialization.to_state_dict(_to_host(opt_state))
            if opt_state is not None
            else None
        ),
        "extra": extra or {},
    }
    data = serialization.msgpack_serialize(blob)
    path = os.path.join(directory, f"{name}_{step:010d}{CKPT_SUFFIX}")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


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
