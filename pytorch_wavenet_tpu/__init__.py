"""pytorch_wavenet_tpu — a TPU-native WaveNet framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
vincentherrmann/pytorch-wavenet (mounted read-only at /root/reference):
mu-law audio featurization, the dilated-causal-conv residual/skip stack with
gated activations, Fast-WaveNet cached-queue autoregressive generation, a
training loop with checkpointing and TensorBoard-compatible logging, and
multi-chip data/model parallelism via jax.sharding meshes.
"""

from .config import WaveNetConfig, PRESETS, get_config
from .models.wavenet import (
    init_wavenet,
    wavenet_logits,
    forward,
    parameter_count,
    upsample_cond,
)
from .models.generate import (
    GenState,
    StreamState,
    init_gen_state,
    gen_step,
    gen_step_window,
    commit_window,
    generate,
    generate_fast,
    generate_long,
    synthesize,
)
from .models.speculative import speculative_generate
from .serving import ContinuousBatcher, GenerationHandle
from .models.convert import (
    load_reference_snapshot,
    load_torch_snapshot,
    from_reference_state_dict,
    to_reference_state_dict,
    config_from_state_dict,
)
from .ops.mulaw import (
    mu_law_encoding,
    mu_law_expansion,
    quantize_data,
    dequantize_data,
)
from .ops.dilated import dilate, constant_pad_1d
from .ops.queues import DilatedQueue
from .data.dataset import WaveNetDataset, BatchIterator, PrefetchBatchIterator
from .data.audio_io import load_audio, write_wav, list_all_audio_files
from .models.iaf import (
    IAFConfig,
    init_student,
    student_sample,
    student_generate,
)
from .training.distill import distill_loss, distill_step
from .training.trainer import WaveNetTrainer, generate_audio, train_step, eval_step
from .training.optimizers import (
    ema_params,
    lr_schedule,
    reference_adam,
    sgd_normalized,
    with_ema,
)
from .utils.logging import Logger, TensorboardLogger
from .utils.checkpoints import (
    save_checkpoint,
    save_checkpoint_sharded,
    load_checkpoint,
    load_checkpoint_sharded,
    load_latest_model_from,
    latest_checkpoint,
)

__version__ = "0.1.0"
