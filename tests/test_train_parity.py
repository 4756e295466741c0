"""Training-dynamics parity with the reference's torch recipe.

test_convert pins the *forward* against an independent torch oracle; this
module pins the *optimizer semantics*: from identical converted init and
identical batches, N steps of the reference trainer's recipe — Adam with
L2-style weight decay folded into the gradient, preceded by global-norm
gradient clipping (reference: wavenet_training.py:41,74-76) — must produce
the same loss trajectory and the same final weights in torch and in
``training/trainer.py``'s fused ``train_step``.

What this cross-checks (each has silently-wrong failure modes):
- eps placement: torch Adam adds eps to sqrt(v) *outside* the bias-correction
  ratio; optax's ``scale_by_adam`` differs only by an eps*sqrt(bc2) term.
- weight decay: torch couples wd*p into the gradient *before* the moment
  updates (L2, not decoupled/AdamW) — ``optax.add_decayed_weights`` must sit
  before ``scale_by_adam`` in the chain for that.
- clip order: clip_grad_norm runs after backward, before the decay/Adam
  machinery.

Tolerances are bf16-scale: the TPU/axon platform multiplies f32 matmuls in
bf16 passes (CLAUDE.md), so per-step logits differ at ~1e-3 relative and the
drift compounds through the weights over the trajectory.
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
)
from pytorch_wavenet_tpu.training.optimizers import reference_adam  # noqa: E402
from pytorch_wavenet_tpu.training.trainer import train_step  # noqa: E402

from test_convert import _random_state_dict  # noqa: E402


class _TorchReferenceModel(torch.nn.Module):
    """The reference architecture as live torch parameters (independent
    implementation — F.conv1d with dilation, the semantics of reference
    wavenet_model.py:125-171; see test_convert._torch_reference_forward)."""

    def __init__(self, sd, cfg):
        super().__init__()
        self.cfg = cfg
        # clone: from_numpy shares storage with sd's arrays, and Adam
        # updates parameters in place — without the copy, training here
        # would silently corrupt the init the jax run starts from
        self.p = torch.nn.ParameterDict({
            k.replace(".", "__"): torch.nn.Parameter(
                torch.from_numpy(np.asarray(v)).float().clone()
            )
            for k, v in sd.items()
        })

    def _w(self, k):
        return self.p[k.replace(".", "__")]

    def _b(self, k):
        kk = k.replace(".", "__")
        return self.p[kk] if kk in self.p else None

    def forward(self, x_classes):
        cfg = self.cfg
        x = F.one_hot(x_classes, cfg.classes).float().transpose(1, 2)
        h = F.conv1d(x, self._w("start_conv.weight"), self._b("start_conv.bias"))
        skip = None
        for i, d in enumerate(cfg.dilations):
            f = F.conv1d(h, self._w(f"filter_convs.{i}.weight"),
                         self._b(f"filter_convs.{i}.bias"), dilation=d)
            g = F.conv1d(h, self._w(f"gate_convs.{i}.weight"),
                         self._b(f"gate_convs.{i}.bias"), dilation=d)
            u = torch.tanh(f) * torch.sigmoid(g)
            s = F.conv1d(u, self._w(f"skip_convs.{i}.weight"),
                         self._b(f"skip_convs.{i}.bias"))
            skip = s if skip is None else skip[:, :, -s.size(2):] + s
            r = F.conv1d(u, self._w(f"residual_convs.{i}.weight"),
                         self._b(f"residual_convs.{i}.bias"))
            h = r + h[:, :, (cfg.kernel_size - 1) * d:]
        y = torch.relu(skip)
        y = torch.relu(F.conv1d(y, self._w("end_conv_1.weight"),
                                self._b("end_conv_1.bias")))
        y = F.conv1d(y, self._w("end_conv_2.weight"),
                     self._b("end_conv_2.bias"))
        return y[:, :, -cfg.output_length:]  # (N, C, out)


def _fixed_batches(cfg, n_steps, batch, seed, distinct=4):
    """``distinct`` fixed batches cycled over ``n_steps`` — repeated data
    gives the optimizers something to memorize, so the loss trajectory has
    real downward dynamics to compare (fresh random labels every step would
    compare noise around log(C))."""
    rng = np.random.default_rng(seed)
    pool = []
    for _ in range(distinct):
        seq = rng.integers(0, cfg.classes, (batch, cfg.item_length + 1))
        pool.append((seq[:, :-1].astype(np.int64),
                     seq[:, -cfg.output_length:].astype(np.int64)))
    xs = [pool[i % distinct][0] for i in range(n_steps)]
    ts = [pool[i % distinct][1] for i in range(n_steps)]
    return xs, ts


def _run_torch(sd, cfg, xs, ts, lr, weight_decay, clip):
    """The reference trainer's inner loop, verbatim semantics
    (wavenet_training.py:63-77): forward, mean cross-entropy on flattened
    logits, zero_grad/backward, clip_grad_norm, Adam step."""
    model = _TorchReferenceModel(sd, cfg)
    opt = torch.optim.Adam(model.parameters(), lr=lr,
                           weight_decay=weight_decay)
    losses, norms = [], []
    for x, t in zip(xs, ts):
        y = model(torch.from_numpy(x))  # (N, C, out)
        loss = F.cross_entropy(
            y.transpose(1, 2).reshape(-1, cfg.classes),
            torch.from_numpy(t).reshape(-1),
        )
        opt.zero_grad()
        loss.backward()
        if clip is not None:
            norms.append(float(torch.nn.utils.clip_grad_norm_(
                model.parameters(), clip)))
        opt.step()
        losses.append(float(loss))
    final = {k.replace("__", "."): v.detach().numpy().copy()
             for k, v in model.p.items()}
    # Known semantic divergence, excluded from the weight comparison: the
    # last layer's residual conv never reaches the loss (its output is
    # dropped after the final skip), so torch leaves .grad=None and Adam
    # SKIPS the parameter entirely — under weight decay it never moves.
    # optax sees a structural zero gradient instead, so
    # add_decayed_weights still shrinks the dead parameter toward 0.
    # Harmless by construction (the parameter cannot affect the model
    # function), but not bitwise-comparable.
    dead = {k.replace("__", ".") for k, v in model.p.items()
            if v.grad is None}
    return np.asarray(losses), final, norms, dead


def _run_ours(sd, cfg, xs, ts, lr, weight_decay, clip):
    params = from_reference_state_dict(sd, cfg)
    tx = reference_adam(lr, weight_decay=weight_decay,
                        gradient_clipping=clip)
    opt_state = tx.init(params)
    losses = []
    for x, t in zip(xs, ts):
        params, opt_state, loss, _ = train_step(
            params, opt_state, cfg, tx, jnp.asarray(x), jnp.asarray(t)
        )
        losses.append(float(loss))
    return np.asarray(losses), to_reference_state_dict(params, cfg)


@pytest.mark.parametrize(
    "weight_decay,clip",
    [(0.0, None), (0.01, 0.3)],
    ids=["plain-adam", "decay+clip"],
)
def test_training_dynamics_match_torch(weight_decay, clip):
    cfg = wt.WaveNetConfig(
        layers=2, blocks=2, dilation_channels=8, residual_channels=8,
        skip_channels=16, end_channels=16, classes=32, output_length=4,
        bias=True,
    )
    sd = _random_state_dict(cfg, seed=21)
    n_steps, lr = 50, 1e-3
    xs, ts = _fixed_batches(cfg, n_steps, batch=4, seed=22)

    t_loss, t_final, t_norms, dead = _run_torch(sd, cfg, xs, ts, lr,
                                                weight_decay, clip)
    j_loss, j_final = _run_ours(sd, cfg, xs, ts, lr, weight_decay, clip)

    if clip is not None:
        # the recipe must actually be exercised: clipping engaged
        assert max(t_norms) > clip

    # training actually trains (random labels -> memorization pressure
    # still lowers loss from the uniform ~log(C) start)
    assert t_loss[-1] < t_loss[0]

    # loss trajectories: tight early (few accumulated rounding steps),
    # bf16-drift tolerance across the whole run
    np.testing.assert_allclose(j_loss[:10], t_loss[:10], atol=5e-3)
    np.testing.assert_allclose(j_loss, t_loss, atol=3e-2)

    # final weights agree parameter-by-parameter at bf16 drift scale,
    # relative to how far each tensor moved from init
    for k, tv in t_final.items():
        if k in dead:
            continue  # see _run_torch: None-grad params diverge by design
        jv = np.asarray(j_final[k], np.float32).reshape(tv.shape)
        moved = np.abs(tv - np.asarray(sd[k])).max()
        diff = np.abs(jv - tv).max()
        assert diff <= max(0.10 * moved, 2e-4), (
            f"{k}: torch-vs-jax drift {diff:.2e} vs movement {moved:.2e}"
        )
