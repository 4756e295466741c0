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

import dataclasses
import sys
import types
from typing import Mapping, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..config import WaveNetConfig
from .wavenet import Params


def config_from_state_dict(
    sd: Mapping[str, np.ndarray],
    *,
    layers: Optional[int] = None,
    blocks: Optional[int] = None,
    output_length: Optional[int] = None,
) -> WaveNetConfig:
    """Infer the architecture from parameter shapes.

    Channel widths, kernel size and bias are fully determined by the shapes.
    The (layers, blocks) split is NOT: every per-layer conv has an identical
    shape regardless of its dilation, so a flat state dict cannot reveal
    where the doubling schedule resets (reference: wavenet_model.py:70-109).
    Guessing wrong silently produces the wrong receptive field and a wrong
    rollout — e.g. a 30-conv chaconne stack read as ``blocks=1`` would get a
    2^0..2^29 schedule instead of 3x(2^0..2^9). Therefore the split must be
    supplied: pass ``layers``/``blocks`` explicitly, or use
    :func:`load_reference_snapshot`, which reads them off the pickled module.
    """
    n_layer_convs = len(
        {k.split(".")[1] for k in sd if k.startswith("filter_convs.")}
    )
    if layers is None and blocks is None:
        raise ValueError(
            f"state dict has {n_layer_convs} gated layers but the "
            "(layers, blocks) split is not recoverable from parameter "
            "shapes — pass layers= and/or blocks=, or load the whole-module "
            "snapshot via load_reference_snapshot() which carries them"
        )
    if layers is None:
        if n_layer_convs % blocks:
            raise ValueError(f"{n_layer_convs} layers not divisible by blocks={blocks}")
        layers = n_layer_convs // blocks
    if blocks is None:
        if n_layer_convs % layers:
            raise ValueError(f"{n_layer_convs} layers not divisible by layers={layers}")
        blocks = n_layer_convs // layers
    if layers * blocks != n_layer_convs:
        raise ValueError(
            f"layers*blocks = {layers}*{blocks} != {n_layer_convs} gated "
            "layers found in the state dict"
        )
    D, R, k = sd["filter_convs.0.weight"].shape
    S = sd["skip_convs.0.weight"].shape[0]
    E = sd["end_conv_1.weight"].shape[0]
    C = sd["end_conv_2.weight"].shape[0]
    bias = "filter_convs.0.bias" in sd
    kwargs = dict(
        layers=layers,
        blocks=blocks,
        dilation_channels=D,
        residual_channels=R,
        skip_channels=S,
        end_channels=E,
        classes=C,
        kernel_size=k,
        bias=bias,
    )
    if output_length is not None:
        kwargs["output_length"] = output_length
    return WaveNetConfig(**kwargs)


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


# Attributes the reference module carries that pin the architecture
# (reference: wavenet_model.py:41-57,119-122). ``dilations`` is the
# per-layer (new_dilation, init_dilation) schedule — redundant with
# (layers, blocks) but kept for cross-checking.
_ARCH_ATTRS = ("layers", "blocks", "kernel_size", "classes", "output_length",
               "dilations", "receptive_field")


def _stub_reference_modules():
    """Build importable stand-ins for the reference's module layout so a
    whole-module pickle (``torch.save(model, ...)``, reference:
    wavenet_training.py:88) can be deserialized without the reference
    package on sys.path.

    Pickle reconstructs an nn.Module subclass without calling __init__
    (``cls.__new__`` + ``__setstate__``), so an empty subclass with the
    right module/class name is enough: the unpickled object gets the real
    ``_parameters``/``_modules`` tree (state_dict() works) and the plain
    attributes (``layers``, ``blocks``...) verbatim. Non-module classes in
    the pickle (e.g. the generation queues) become featureless objects.
    """
    import torch

    stubs = {}
    for name in ("wavenet_model", "wavenet_modules"):
        mod = types.ModuleType(name)
        mod.__getattr__ = (
            lambda attr, _name=name: _make_stub_class(_name, attr, torch)
        )
        stubs[name] = mod
    return stubs


def _make_stub_class(module_name: str, attr: str, torch):
    if attr.startswith("__"):
        raise AttributeError(attr)
    base = (torch.nn.Module,) if attr == "WaveNetModel" else ()
    cls = type(attr, base, {})
    cls.__module__ = module_name
    return cls


def load_torch_snapshot(path: str) -> Tuple[dict, Optional[dict]]:
    """Load a reference torch snapshot file.

    Returns ``(state_dict, arch)`` where ``state_dict`` maps reference
    parameter names to numpy arrays and ``arch`` is a dict of the pickled
    module's architecture attributes (``layers``, ``blocks``,
    ``kernel_size``, ...) — or ``None`` if the file held a bare state dict,
    which carries no such metadata (see :func:`config_from_state_dict`).

    Whole-module pickles (the reference's snapshot format,
    wavenet_training.py:88) are deserialized via stub classes injected into
    ``sys.modules`` so the reference package itself is not required.
    """
    import torch

    stubs = _stub_reference_modules()
    injected = [n for n in stubs if n not in sys.modules]
    for n in injected:
        sys.modules[n] = stubs[n]
    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    finally:
        for n in injected:
            sys.modules.pop(n, None)

    arch = None
    if hasattr(obj, "state_dict"):
        sd = obj.state_dict()
        arch = {a: getattr(obj, a) for a in _ARCH_ATTRS if hasattr(obj, a)}
    else:
        sd = obj
    return (
        {k: v.detach().cpu().numpy() for k, v in sd.items()},
        arch,
    )


def config_from_snapshot_arch(
    sd: Mapping[str, np.ndarray], arch: Mapping
) -> WaveNetConfig:
    """Build a config from a state dict plus the pickled module's
    architecture attributes, cross-checking the two."""
    cfg = config_from_state_dict(
        sd,
        layers=int(arch["layers"]),
        blocks=int(arch["blocks"]),
        output_length=int(arch["output_length"]) if "output_length" in arch else None,
    )
    if "kernel_size" in arch and int(arch["kernel_size"]) != cfg.kernel_size:
        raise ValueError(
            f"module says kernel_size={arch['kernel_size']} but weights have "
            f"k={cfg.kernel_size}"
        )
    if "classes" in arch and int(arch["classes"]) != cfg.classes:
        raise ValueError(
            f"module says classes={arch['classes']} but weights have "
            f"C={cfg.classes}"
        )
    # the reference records per-layer (new_dilation, init_dilation) pairs
    # (wavenet_model.py:70-75); cross-check against our derived schedule
    if "dilations" in arch and arch["dilations"]:
        got = tuple(int(d[0]) if isinstance(d, (tuple, list)) else int(d)
                    for d in arch["dilations"])
        if got != cfg.dilations:
            raise ValueError(
                f"module dilation schedule {got} does not match the "
                f"(layers={cfg.layers}, blocks={cfg.blocks}) doubling "
                f"schedule {cfg.dilations}"
            )
    if "receptive_field" in arch and int(arch["receptive_field"]) != cfg.receptive_field:
        raise ValueError(
            f"module receptive_field={arch['receptive_field']} != derived "
            f"{cfg.receptive_field}"
        )
    return cfg


def load_reference_snapshot(
    path: str,
    *,
    layers: Optional[int] = None,
    blocks: Optional[int] = None,
    output_length: Optional[int] = None,
    **config_overrides,
) -> Tuple[Params, WaveNetConfig]:
    """One-stop load of a reference snapshot into (stacked params, config).

    Whole-module pickles carry their architecture; bare state dicts need the
    (layers, blocks) split passed in. Explicit arguments win over pickled
    attributes. ``config_overrides`` go to ``dataclasses.replace`` on the
    final config (e.g. ``compute_dtype=jnp.bfloat16``).
    """
    sd, arch = load_torch_snapshot(path)
    if arch is not None and "layers" in arch and "blocks" in arch:
        if layers is not None or blocks is not None or output_length is not None:
            cfg = config_from_state_dict(
                sd,
                layers=layers if layers is not None else int(arch["layers"]),
                blocks=blocks if blocks is not None else int(arch["blocks"]),
                output_length=output_length,
            )
        else:
            cfg = config_from_snapshot_arch(sd, arch)
    else:
        cfg = config_from_state_dict(
            sd, layers=layers, blocks=blocks, output_length=output_length
        )
    if config_overrides:
        cfg = dataclasses.replace(cfg, **config_overrides)
    return from_reference_state_dict(sd, cfg), cfg
