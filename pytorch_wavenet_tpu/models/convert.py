"""Weight conversion from reference PyTorch snapshots.

The reference pickles whole ``WaveNetModel`` modules (reference:
wavenet_training.py:88, wavenet_model.py:330-346). This module converts a
state-dict-shaped mapping of numpy arrays (the reference module's parameter
names) into this framework's stacked parameter pytree, so snapshots such as
``snapshots/chaconne_model_2017-12-28_16-44-12`` can be loaded for the
waveform-parity checks in BASELINE.md.

Layout mapping (torch Conv1d weight is ``(out_ch, in_ch, k)``):

* ``start_conv.weight (R, C, 1)``      -> ``start.w (C, R)``
* ``filter_convs.{i}.weight (D, R, k)``-> ``layers.w_in[i, j, r, :D]`` with
  torch kernel index j == tap j (oldest tap first): after the reference's
  batch-folding, conv tap j reads real time ``t - (k-1-j)*d`` — the same
  convention as models.wavenet (see its layer body).
* ``gate_convs.{i}.weight``            -> ``layers.w_in[i, j, r, D:]``
* ``residual_convs.{i}.weight (R, D, 1)`` -> ``layers.w_res[i] (D, R)``
* ``skip_convs.{i}.weight (S, D, 1)``  -> ``layers.w_skip[i] (D, S)``
* ``end_conv_1.weight (E, S, 1)``      -> ``end1.w (S, E)``; bias kept
* ``end_conv_2.weight (C, E, 1)``      -> ``end2.w (E, C)``; bias kept
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
import jax.numpy as jnp

from ..config import WaveNetConfig
from .wavenet import Params


def config_from_state_dict(sd: Mapping[str, np.ndarray]) -> WaveNetConfig:
    """Infer the architecture from parameter shapes. ``layers``/``blocks``
    are inferred from the number of per-layer convs and the dilation reset
    pattern can't be observed from shapes alone, so the caller may override;
    the default assumes the reference's 2^i-per-block doubling with the
    longest pure-doubling run as the per-block layer count."""
    n_layer_convs = len(
        {k.split(".")[1] for k in sd if k.startswith("filter_convs.")}
    )
    D, R, k = sd["filter_convs.0.weight"].shape
    S = sd["skip_convs.0.weight"].shape[0]
    E = sd["end_conv_1.weight"].shape[0]
    C = sd["end_conv_2.weight"].shape[0]
    bias = "filter_convs.0.bias" in sd
    return WaveNetConfig(
        layers=n_layer_convs,  # caller should fix blocks/layers split
        blocks=1,
        dilation_channels=D,
        residual_channels=R,
        skip_channels=S,
        end_channels=E,
        classes=C,
        kernel_size=k,
        bias=bias,
    )


def from_reference_state_dict(
    sd: Mapping[str, np.ndarray], cfg: WaveNetConfig
) -> Params:
    """Build the stacked params pytree from reference-named arrays."""
    L, k = cfg.num_layers, cfg.kernel_size
    R, D, S = cfg.residual_channels, cfg.dilation_channels, cfg.skip_channels

    def w(name):
        return np.asarray(sd[name], dtype=np.float32)

    w_in = np.zeros((L, k, R, 2 * D), np.float32)
    w_res = np.zeros((L, D, R), np.float32)
    w_skip = np.zeros((L, D, S), np.float32)
    for i in range(L):
        # (D, R, k) -> (k, R, D)
        w_in[i, :, :, :D] = w(f"filter_convs.{i}.weight").transpose(2, 1, 0)
        w_in[i, :, :, D:] = w(f"gate_convs.{i}.weight").transpose(2, 1, 0)
        w_res[i] = w(f"residual_convs.{i}.weight")[:, :, 0].T  # (R,D,1)->(D,R)
        w_skip[i] = w(f"skip_convs.{i}.weight")[:, :, 0].T  # (S,D,1)->(D,S)

    params: Params = {
        "start": {"w": w("start_conv.weight")[:, :, 0].T},  # (R,C,1)->(C,R)
        "layers": {
            "w_in": jnp.asarray(w_in),
            "w_res": jnp.asarray(w_res),
            "w_skip": jnp.asarray(w_skip),
        },
        "end1": {
            "w": jnp.asarray(w("end_conv_1.weight")[:, :, 0].T),
            "b": jnp.asarray(w("end_conv_1.bias")),
        },
        "end2": {
            "w": jnp.asarray(w("end_conv_2.weight")[:, :, 0].T),
            "b": jnp.asarray(w("end_conv_2.bias")),
        },
    }
    params["start"]["w"] = jnp.asarray(params["start"]["w"])
    if cfg.bias:
        params["start"]["b"] = jnp.asarray(w("start_conv.bias"))
        b_in = np.zeros((L, 2 * D), np.float32)
        b_res = np.zeros((L, R), np.float32)
        b_skip = np.zeros((L, S), np.float32)
        for i in range(L):
            b_in[i, :D] = w(f"filter_convs.{i}.bias")
            b_in[i, D:] = w(f"gate_convs.{i}.bias")
            b_res[i] = w(f"residual_convs.{i}.bias")
            b_skip[i] = w(f"skip_convs.{i}.bias")
        params["layers"]["b_in"] = jnp.asarray(b_in)
        params["layers"]["b_res"] = jnp.asarray(b_res)
        params["layers"]["b_skip"] = jnp.asarray(b_skip)
    return params


def to_reference_state_dict(params: Params, cfg: WaveNetConfig) -> dict:
    """Inverse of :func:`from_reference_state_dict` (for exporting snapshots
    a reference user can inspect)."""
    L, k = cfg.num_layers, cfg.kernel_size
    D = cfg.dilation_channels
    lp = params["layers"]
    sd: dict[str, np.ndarray] = {
        "start_conv.weight": np.asarray(params["start"]["w"]).T[:, :, None],
        "end_conv_1.weight": np.asarray(params["end1"]["w"]).T[:, :, None],
        "end_conv_1.bias": np.asarray(params["end1"]["b"]),
        "end_conv_2.weight": np.asarray(params["end2"]["w"]).T[:, :, None],
        "end_conv_2.bias": np.asarray(params["end2"]["b"]),
    }
    for i in range(L):
        w_in = np.asarray(lp["w_in"][i])  # (k, R, 2D)
        sd[f"filter_convs.{i}.weight"] = w_in[:, :, :D].transpose(2, 1, 0)
        sd[f"gate_convs.{i}.weight"] = w_in[:, :, D:].transpose(2, 1, 0)
        sd[f"residual_convs.{i}.weight"] = np.asarray(lp["w_res"][i]).T[:, :, None]
        sd[f"skip_convs.{i}.weight"] = np.asarray(lp["w_skip"][i]).T[:, :, None]
        if cfg.bias:
            b_in = np.asarray(lp["b_in"][i])
            sd[f"filter_convs.{i}.bias"] = b_in[:D]
            sd[f"gate_convs.{i}.bias"] = b_in[D:]
            sd[f"residual_convs.{i}.bias"] = np.asarray(lp["b_res"][i])
            sd[f"skip_convs.{i}.bias"] = np.asarray(lp["b_skip"][i])
    if cfg.bias:
        sd["start_conv.bias"] = np.asarray(params["start"]["b"])
    return sd


def load_torch_snapshot(path: str) -> dict:
    """Extract a numpy state dict from a reference torch snapshot file
    (whole-module pickle, reference: wavenet_training.py:88)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}
