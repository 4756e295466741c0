"""Weight-conversion parity tests.

Ground truth is torch.nn.functional.conv1d with dilation — mathematically
what the reference's batch-folding dilate() + kernel-2 conv computes
(reference: wavenet_modules.py:10-39 + wavenet_model.py:84-92) — evaluated
on an independently-written torch forward pass. A reference snapshot's
state dict converted through models.convert must produce allclose logits.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import pytorch_wavenet_tpu as wt  # noqa: E402
from pytorch_wavenet_tpu.models.convert import (  # noqa: E402
    from_reference_state_dict,
    to_reference_state_dict,
    load_torch_snapshot,
)
from pytorch_wavenet_tpu.models.wavenet import wavenet_logits  # noqa: E402


def _torch_reference_forward(sd, cfg, x_classes):
    """Independent torch implementation of the reference architecture:
    start 1x1 -> per-layer gated dilated conv (via F.conv1d dilation) with
    residual + skip 1x1s -> relu/1x1/relu/1x1 head. Right-aligned skip
    accumulation, position-aligned residual add — the semantics of
    reference wavenet_model.py:125-171."""
    t = {k: torch.from_numpy(np.asarray(v)).float() for k, v in sd.items()}
    N, T = x_classes.shape
    x = F.one_hot(torch.from_numpy(np.asarray(x_classes)).long(), cfg.classes)
    x = x.float().transpose(1, 2)  # (N, C, T)

    h = F.conv1d(x, t["start_conv.weight"], t.get("start_conv.bias"))
    skip = None
    for i, d in enumerate(cfg.dilations):
        f = F.conv1d(
            h, t[f"filter_convs.{i}.weight"], t.get(f"filter_convs.{i}.bias"),
            dilation=d,
        )
        g = F.conv1d(
            h, t[f"gate_convs.{i}.weight"], t.get(f"gate_convs.{i}.bias"),
            dilation=d,
        )
        u = torch.tanh(f) * torch.sigmoid(g)  # length T - (k-1)*d
        s = F.conv1d(
            u, t[f"skip_convs.{i}.weight"], t.get(f"skip_convs.{i}.bias")
        )
        skip = s if skip is None else skip[:, :, -s.size(2):] + s
        r = F.conv1d(
            u, t[f"residual_convs.{i}.weight"], t.get(f"residual_convs.{i}.bias")
        )
        h = r + h[:, :, (cfg.kernel_size - 1) * d :]

    y = torch.relu(skip)
    y = torch.relu(F.conv1d(y, t["end_conv_1.weight"], t["end_conv_1.bias"]))
    y = F.conv1d(y, t["end_conv_2.weight"], t["end_conv_2.bias"])
    return y.detach().numpy()  # (N, classes, T - rf + 1)


def _random_state_dict(cfg, seed=0):
    rng = np.random.default_rng(seed)
    L, k = cfg.num_layers, cfg.kernel_size
    R, D, S, E, C = (
        cfg.residual_channels, cfg.dilation_channels, cfg.skip_channels,
        cfg.end_channels, cfg.classes,
    )

    def u(*shape):
        return rng.uniform(-0.3, 0.3, shape).astype(np.float32)

    sd = {
        "start_conv.weight": u(R, C, 1),
        "end_conv_1.weight": u(E, S, 1),
        "end_conv_1.bias": u(E),
        "end_conv_2.weight": u(C, E, 1),
        "end_conv_2.bias": u(C),
    }
    for i in range(L):
        sd[f"filter_convs.{i}.weight"] = u(D, R, k)
        sd[f"gate_convs.{i}.weight"] = u(D, R, k)
        sd[f"residual_convs.{i}.weight"] = u(R, D, 1)
        sd[f"skip_convs.{i}.weight"] = u(S, D, 1)
        if cfg.bias:
            sd[f"filter_convs.{i}.bias"] = u(D)
            sd[f"gate_convs.{i}.bias"] = u(D)
            sd[f"residual_convs.{i}.bias"] = u(R)
            sd[f"skip_convs.{i}.bias"] = u(S)
    if cfg.bias:
        sd["start_conv.bias"] = u(R)
    return sd


def test_single_dilated_conv_tap_convention():
    """Our tap-j == torch kernel-index-j convention, checked against
    F.conv1d(dilation=d) directly."""
    rng = np.random.default_rng(1)
    R, D, k, d, T = 4, 3, 2, 4, 32
    w = rng.standard_normal((D, R, k)).astype(np.float32)
    x = rng.standard_normal((1, R, T)).astype(np.float32)
    ref = F.conv1d(torch.from_numpy(x), torch.from_numpy(w), dilation=d).numpy()

    # our formulation: y[p] = sum_j x[p-(k-1-j)*d] @ w_in[j]
    w_in = w.transpose(2, 1, 0)  # (k, R, D)
    xt = x[0].T  # (T, R)
    ours = np.zeros((T, D), np.float32)
    for j in range(k):
        shift = (k - 1 - j) * d
        ours[shift:] += xt[: T - shift] @ w_in[j] if shift else xt @ w_in[j]
    np.testing.assert_allclose(ours[(k - 1) * d :], ref[0].T, atol=1e-5)


@pytest.mark.parametrize("bias", [False, True])
def test_full_model_parity_with_torch_reference(bias):
    cfg = wt.WaveNetConfig(
        layers=3, blocks=2, dilation_channels=8, residual_channels=8,
        skip_channels=16, end_channels=16, classes=32, output_length=5,
        bias=bias,
    )
    sd = _random_state_dict(cfg, seed=2)
    params = from_reference_state_dict(sd, cfg)
    assert wt.parameter_count(params) == cfg.parameter_count()

    x = np.random.default_rng(3).integers(0, cfg.classes, (2, cfg.item_length))
    ours = np.asarray(wavenet_logits(params, cfg, jnp.asarray(x), cfg.output_length))
    ref = _torch_reference_forward(sd, cfg, x)  # (N, C, out)
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 1), atol=5e-3)


def test_fast_generation_parity_with_torch_reference():
    """End-to-end: argmax rollout of the converted model equals stepping the
    torch reference forward sample by sample."""
    cfg = wt.WaveNetConfig(
        layers=2, blocks=2, dilation_channels=8, residual_channels=8,
        skip_channels=8, end_channels=8, classes=16, output_length=1,
        bias=True,
    )
    sd = _random_state_dict(cfg, seed=5)
    params = from_reference_state_dict(sd, cfg)
    rf = cfg.receptive_field
    rng = np.random.default_rng(6)
    prime = rng.integers(0, cfg.classes, (1, rf))

    _, ours = wt.generate_fast(
        params, cfg, jax.random.PRNGKey(0), 12, jnp.asarray(prime), temperature=0.0
    )
    ours = np.asarray(ours[0])

    window = list(prime[0])
    theirs = []
    for _ in range(12):
        logits = _torch_reference_forward(
            sd, cfg, np.asarray(window[-rf:], np.int64)[None, :]
        )[0, :, -1]
        c = int(np.argmax(logits))
        theirs.append(c)
        window.append(c)
    np.testing.assert_array_equal(ours, np.asarray(theirs))


def test_state_dict_roundtrip():
    cfg = wt.get_config("tiny")
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    sd = to_reference_state_dict(params, cfg)
    params2 = from_reference_state_dict(sd, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_torch_snapshot_bare_state_dict(tmp_path):
    """Round-trip through an actual torch-saved state dict file: no module
    metadata, so arch is None and the split must come from the caller."""
    cfg = wt.WaveNetConfig(
        layers=2, blocks=1, dilation_channels=4, residual_channels=4,
        skip_channels=4, end_channels=4, classes=8, output_length=2,
    )
    sd = _random_state_dict(cfg, seed=7)
    path = str(tmp_path / "snap.pt")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)
    loaded, arch = load_torch_snapshot(path)
    assert arch is None
    assert set(loaded) == set(sd)
    params = from_reference_state_dict(loaded, cfg)
    assert wt.parameter_count(params) == cfg.parameter_count()


def test_config_from_state_dict_infers_shapes():
    from pytorch_wavenet_tpu.models.convert import config_from_state_dict

    cfg = wt.WaveNetConfig(
        layers=3, blocks=2, dilation_channels=8, residual_channels=8,
        skip_channels=16, end_channels=16, classes=32, bias=True,
    )
    sd = _random_state_dict(cfg, seed=11)
    inferred = config_from_state_dict(sd, layers=3, blocks=2)
    assert inferred.layers == 3 and inferred.blocks == 2
    assert inferred.dilation_channels == 8
    assert inferred.residual_channels == 8
    assert inferred.skip_channels == 16
    assert inferred.end_channels == 16
    assert inferred.classes == 32
    assert inferred.kernel_size == cfg.kernel_size
    assert inferred.bias
    assert inferred.dilations == cfg.dilations

    # one factor determines the other
    assert config_from_state_dict(sd, layers=3).blocks == 2
    assert config_from_state_dict(sd, blocks=2).layers == 3


def test_config_from_state_dict_requires_split():
    """The (layers, blocks) split is not observable from shapes — guessing
    silently (the round-1 blocks=1 default) produced a wrong dilation
    schedule, so now it must raise."""
    from pytorch_wavenet_tpu.models.convert import config_from_state_dict

    cfg = wt.WaveNetConfig(
        layers=3, blocks=2, dilation_channels=4, residual_channels=4,
        skip_channels=4, end_channels=4, classes=8,
    )
    sd = _random_state_dict(cfg, seed=12)
    with pytest.raises(ValueError, match="layers, blocks"):
        config_from_state_dict(sd)
    with pytest.raises(ValueError):
        config_from_state_dict(sd, layers=4)  # 6 % 4 != 0
    with pytest.raises(ValueError):
        config_from_state_dict(sd, layers=3, blocks=3)


def _save_reference_like_module(cfg, sd, path):
    """Pickle a module that is byte-level indistinguishable from a reference
    snapshot: an nn.Module subclass named wavenet_model.WaveNetModel with
    the reference's attribute names (wavenet_model.py:41-57,119-122) and
    parameter tree, plus wavenet_modules.DilatedQueue members. Built here
    independently — not imported from /root/reference."""
    import sys
    import types

    import torch.nn as nn

    qmod = types.ModuleType("wavenet_modules")

    class DilatedQueue:
        def __init__(self, max_length, num_channels, dilation):
            self.max_length = max_length
            self.num_channels = num_channels
            self.dilation = dilation
            self.in_pos = 0
            self.out_pos = 0
            self.data = torch.zeros(num_channels, max_length)

    DilatedQueue.__module__ = "wavenet_modules"
    DilatedQueue.__qualname__ = "DilatedQueue"
    qmod.DilatedQueue = DilatedQueue

    mmod = types.ModuleType("wavenet_model")

    class WaveNetModel(nn.Module):
        pass

    WaveNetModel.__module__ = "wavenet_model"
    WaveNetModel.__qualname__ = "WaveNetModel"
    mmod.WaveNetModel = WaveNetModel

    m = WaveNetModel()
    m.layers = cfg.layers
    m.blocks = cfg.blocks
    m.kernel_size = cfg.kernel_size
    m.classes = cfg.classes
    m.output_length = cfg.output_length
    m.receptive_field = cfg.receptive_field
    m.dilations = []
    m.dilated_queues = []
    init_dilation = 1
    for d in cfg.dilations:
        m.dilations.append((d, init_dilation))
        m.dilated_queues.append(
            DilatedQueue((cfg.kernel_size - 1) * d + 1, cfg.residual_channels, d)
        )
        init_dilation = d
    bias = cfg.bias
    m.start_conv = nn.Conv1d(cfg.classes, cfg.residual_channels, 1, bias=bias)
    m.filter_convs = nn.ModuleList()
    m.gate_convs = nn.ModuleList()
    m.residual_convs = nn.ModuleList()
    m.skip_convs = nn.ModuleList()
    for _ in range(cfg.num_layers):
        m.filter_convs.append(
            nn.Conv1d(cfg.residual_channels, cfg.dilation_channels,
                      cfg.kernel_size, bias=bias))
        m.gate_convs.append(
            nn.Conv1d(cfg.residual_channels, cfg.dilation_channels,
                      cfg.kernel_size, bias=bias))
        m.residual_convs.append(
            nn.Conv1d(cfg.dilation_channels, cfg.residual_channels, 1, bias=bias))
        m.skip_convs.append(
            nn.Conv1d(cfg.dilation_channels, cfg.skip_channels, 1, bias=bias))
    m.end_conv_1 = nn.Conv1d(cfg.skip_channels, cfg.end_channels, 1, bias=True)
    m.end_conv_2 = nn.Conv1d(cfg.end_channels, cfg.classes, 1, bias=True)
    m.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()})

    sys.modules["wavenet_model"] = mmod
    sys.modules["wavenet_modules"] = qmod
    try:
        torch.save(m, path)
    finally:
        del sys.modules["wavenet_model"]
        del sys.modules["wavenet_modules"]


def test_whole_module_snapshot_chaconne_shaped(tmp_path):
    """A 10x3-shaped whole-module pickle (thin channels for speed) loads
    with the correct 3x(2^0..2^9) dilation schedule and rf=3070 — the exact
    failure mode of round 1's blocks=1 default."""
    from pytorch_wavenet_tpu.models.convert import load_reference_snapshot

    cfg = wt.WaveNetConfig(
        layers=10, blocks=3, dilation_channels=2, residual_channels=2,
        skip_channels=4, end_channels=4, classes=8, output_length=16,
        bias=True,
    )
    sd = _random_state_dict(cfg, seed=13)
    path = str(tmp_path / "chaconne_shaped.pt")
    _save_reference_like_module(cfg, sd, path)

    params, loaded_cfg = load_reference_snapshot(path)
    assert loaded_cfg.layers == 10 and loaded_cfg.blocks == 3
    assert loaded_cfg.dilations == tuple(2 ** (i % 10) for i in range(30))
    assert loaded_cfg.receptive_field == 3070
    assert loaded_cfg.output_length == 16
    assert wt.parameter_count(params) == cfg.parameter_count()


def test_whole_module_snapshot_end_to_end_rollout(tmp_path):
    """Whole-module pickle -> load_reference_snapshot -> argmax rollout
    matches the independent torch oracle, with no architecture hints
    given by the caller."""
    from pytorch_wavenet_tpu.models.convert import load_reference_snapshot

    cfg = wt.WaveNetConfig(
        layers=2, blocks=2, dilation_channels=8, residual_channels=8,
        skip_channels=8, end_channels=8, classes=16, output_length=1,
        bias=True,
    )
    sd = _random_state_dict(cfg, seed=14)
    path = str(tmp_path / "snap_module.pt")
    _save_reference_like_module(cfg, sd, path)

    params, loaded_cfg = load_reference_snapshot(path)
    assert loaded_cfg.dilations == cfg.dilations

    rf = loaded_cfg.receptive_field
    rng = np.random.default_rng(15)
    prime = rng.integers(0, cfg.classes, (1, rf))
    _, ours = wt.generate_fast(
        params, loaded_cfg, jax.random.PRNGKey(0), 12, jnp.asarray(prime),
        temperature=0.0,
    )
    ours = np.asarray(ours[0])

    window = list(prime[0])
    theirs = []
    for _ in range(12):
        logits = _torch_reference_forward(
            sd, cfg, np.asarray(window[-rf:], np.int64)[None, :]
        )[0, :, -1]
        c = int(np.argmax(logits))
        theirs.append(c)
        window.append(c)
    np.testing.assert_array_equal(ours, np.asarray(theirs))


def test_load_reference_snapshot_bare_state_dict_needs_split(tmp_path):
    from pytorch_wavenet_tpu.models.convert import load_reference_snapshot

    cfg = wt.WaveNetConfig(
        layers=2, blocks=2, dilation_channels=4, residual_channels=4,
        skip_channels=4, end_channels=4, classes=8,
    )
    sd = _random_state_dict(cfg, seed=16)
    path = str(tmp_path / "bare.pt")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)

    with pytest.raises(ValueError, match="layers, blocks"):
        load_reference_snapshot(path)
    params, loaded_cfg = load_reference_snapshot(path, layers=2, blocks=2)
    assert loaded_cfg.dilations == cfg.dilations
    assert wt.parameter_count(params) == cfg.parameter_count()
