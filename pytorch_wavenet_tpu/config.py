"""Model / run configuration.

The reference hard-codes hyperparameters as constructor kwargs in its entry
scripts (reference: train_script.py:17-25, test_script.py:17-23). Here they
become a frozen dataclass plus named presets so configs are first-class and
hashable (usable as static jit arguments).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class WaveNetConfig:
    """Hyperparameters of a WaveNet stack.

    Field names and defaults mirror the reference constructor
    (reference: wavenet_model.py:28-39) so a reference user can move their
    config over unchanged.
    """

    layers: int = 10
    blocks: int = 4
    dilation_channels: int = 32
    residual_channels: int = 32
    skip_channels: int = 256
    end_channels: int = 256
    classes: int = 256
    output_length: int = 32
    kernel_size: int = 2
    bias: bool = False
    # Local conditioning (mel vocoder; 0 = unconditional like the reference)
    cond_channels: int = 0
    # Global conditioning (e.g. speaker embedding, WaveNet paper eq. 3)
    gcond_channels: int = 0
    # Learnable conditioning upsampler: per-stage stride factors of a
    # transposed-conv stack turning frame-rate cond (B, F, M) into
    # sample-rate (B, T, M); their product must equal the feature hop
    # (e.g. (16, 16) for hop 256). () = non-learned linear interpolation.
    # Initialized to reproduce linear interpolation exactly, so enabling it
    # changes nothing until training moves the weights.
    cond_upsample: tuple[int, ...] = ()
    # TPU-specific knobs (no reference analogue):
    compute_dtype: Any = jnp.float32  # matmul input dtype (bfloat16 for perf)
    # Residual-stream storage dtype in the training trunk. The serial
    # per-layer chain is HBM-bandwidth-bound at chaconne widths (K=32-64
    # matmuls, ~16 FLOPs/byte); storing the inter-layer stream in bfloat16
    # halves that traffic. Accumulation stays f32 (matmuls accumulate in
    # f32; the residual add runs f32 then rounds once per layer).
    stream_dtype: Any = jnp.float32
    remat: bool = False  # jax.checkpoint each layer: trade FLOPs for HBM
    # when training long output windows on deep stacks
    # Skip-path fusion: collect every layer's gated activations and apply all
    # L skip projections as ONE (N*out, L*D) @ (L*D, S) matmul instead of L
    # bandwidth-bound K=D matmuls plus accumulator traffic. K grows from 32
    # to L*32=960 (chaconne), turning the skip path compute-bound on the
    # MXU. None = auto (fuse when out_len >= 128, where the win is real and
    # the tiny-out bitwise-pinned paths stay untouched).
    fuse_skip: bool | None = None
    # Fused Pallas training trunk (ops/pallas/trunk_kernel.py): keep the
    # residual stream VMEM-resident across the whole layer walk instead of
    # round-tripping HBM between L small matmuls; backward is a second
    # kernel recomputing from bf16 stream saves. Unconditioned models only
    # (conditioned training falls back to the XLA trunk).
    trunk_kernel: bool = False

    @property
    def num_layers(self) -> int:
        """Total number of gated residual layers (blocks x layers)."""
        return self.blocks * self.layers

    @property
    def dilations(self) -> tuple[int, ...]:
        """Per-layer dilation schedule: doubles each layer, resets per block
        (reference: wavenet_model.py:70-109)."""
        return tuple(2 ** (i % self.layers) for i in range(self.num_layers))

    @property
    def max_dilation(self) -> int:
        return 2 ** (self.layers - 1)

    @property
    def receptive_field(self) -> int:
        """rf = 1 + blocks * (kernel_size-1) * (2^layers - 1)
        (reference: wavenet_model.py:106-109,123). 3070 for 10x3, 4093 for 10x4."""
        return 1 + self.blocks * (self.kernel_size - 1) * (2**self.layers - 1)

    @property
    def item_length(self) -> int:
        """Training window length so the model emits output_length logits."""
        return self.receptive_field + self.output_length - 1

    def parameter_count(self) -> int:
        """Analytic parameter count (reference: wavenet_model.py:318-321)."""
        c, r, d, s, e, k = (
            self.classes,
            self.residual_channels,
            self.dilation_channels,
            self.skip_channels,
            self.end_channels,
            self.kernel_size,
        )
        n = c * r  # start conv
        per_layer = 2 * (k * r * d) + d * r + d * s
        if self.cond_channels:
            per_layer += self.cond_channels * 2 * d  # local conditioning 1x1
        if self.gcond_channels:
            per_layer += self.gcond_channels * 2 * d  # global conditioning
        if self.bias:
            n += r
            per_layer += 2 * d + r + s
        n += self.num_layers * per_layer
        n += s * e + e  # end_conv_1 (always bias, reference: wavenet_model.py:111-114)
        n += e * c + c  # end_conv_2 (always bias, reference: wavenet_model.py:116-119)
        if self.cond_channels and self.cond_upsample:
            # learnable upsampler: per stage r, two (r, M, M) tap banks
            m = self.cond_channels
            n += sum(2 * r * m * m for r in self.cond_upsample)
        return n

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["compute_dtype"] = jnp.dtype(self.compute_dtype).name
        d["stream_dtype"] = jnp.dtype(self.stream_dtype).name
        return json.dumps(d)

    @classmethod
    def from_json(cls, s: str) -> "WaveNetConfig":
        d = json.loads(s)
        d["compute_dtype"] = jnp.dtype(d["compute_dtype"])
        # older snapshots predate the stream_dtype knob
        if "stream_dtype" in d:
            d["stream_dtype"] = jnp.dtype(d["stream_dtype"])
        # json has no tuples; the config must stay hashable for static jit args
        if "cond_upsample" in d:
            d["cond_upsample"] = tuple(d["cond_upsample"])
        # older snapshots predate the trunk_kernel knob (and unknown future
        # keys should not crash a load)
        known = {f.name for f in dataclasses.fields(cls)}
        d = {k: v for k, v in d.items() if k in known}
        return cls(**d)


# Named presets matching BASELINE.json's configs.
PRESETS: dict[str, WaveNetConfig] = {
    # reference: train_script.py:17-25 (the chaconne training config)
    "chaconne": WaveNetConfig(
        layers=10,
        blocks=3,
        dilation_channels=32,
        residual_channels=32,
        skip_channels=1024,
        end_channels=512,
        output_length=16,
        bias=True,
    ),
    # reference: profiling.ipynb cell 1 / demo.ipynb (10x4, 32ch everywhere)
    "saber": WaveNetConfig(
        layers=10,
        blocks=4,
        dilation_channels=32,
        residual_channels=32,
        skip_channels=32,
        end_channels=32,
        output_length=64,
        bias=False,
    ),
    # reference: test_script.py:17-23 (small smoke-train config)
    "test_small": WaveNetConfig(
        layers=8,
        blocks=4,
        dilation_channels=16,
        residual_channels=16,
        skip_channels=32,
        end_channels=32,
        output_length=8,
        bias=False,
    ),
    # production training config: same stack as chaconne but a window that
    # amortizes the receptive field (the reference's output_length=16 spends
    # a 3085-sample trunk on 16 targets; 1024 targets cost ~1.35x the FLOPs
    # for 64x the supervision)
    "chaconne_wide": WaveNetConfig(
        layers=10,
        blocks=3,
        dilation_channels=32,
        residual_channels=32,
        skip_channels=1024,
        end_channels=512,
        output_length=1024,
        bias=True,
    ),
    # mel-conditioned vocoder (BASELINE config 5): chaconne-class stack,
    # 80-mel local conditioning, wide supervision window; shard the
    # skip/end head over the model axis for multi-chip training
    "vocoder": WaveNetConfig(
        layers=10,
        blocks=3,
        dilation_channels=64,
        residual_channels=64,
        skip_channels=1024,
        end_channels=512,
        output_length=1024,
        bias=True,
        cond_channels=80,
    ),
    # tiny config for unit tests (fast on CPU)
    "tiny": WaveNetConfig(
        layers=3,
        blocks=2,
        dilation_channels=8,
        residual_channels=8,
        skip_channels=16,
        end_channels=16,
        classes=32,
        output_length=4,
        bias=True,
    ),
    # tiny mel-conditioned config: the vocoder flow (train + synthesize)
    # at unit-test scale
    "tiny_vocoder": WaveNetConfig(
        layers=3,
        blocks=2,
        dilation_channels=8,
        residual_channels=8,
        skip_channels=16,
        end_channels=16,
        classes=32,
        output_length=4,
        bias=True,
        cond_channels=8,
    ),
}


def get_config(name: str, **overrides) -> WaveNetConfig:
    cfg = PRESETS[name]
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    return cfg
