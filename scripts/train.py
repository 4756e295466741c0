#!/usr/bin/env python
"""Training entry point.

The reference hard-codes this flow in train_script.py (model + dataset +
TensorboardLogger + trainer wiring, async audio generation from the latest
snapshot every generate_interval steps). Here it is a real CLI over the same
capabilities, plus mesh flags for multi-chip runs.

Example:
  python scripts/train.py --data-dir train_samples/bach_chaconne \
      --config chaconne --batch-size 16 --epochs 10 --snapshot-path snapshots
"""

import os

if os.environ.get("WAVENET_TPU_FORCE_CPU"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", required=True, help="directory of audio files")
    p.add_argument("--dataset-file", default=None,
                   help="npz cache (default: <data-dir>/dataset.npz)")
    p.add_argument("--config", default="chaconne",
                   help="preset name (chaconne|saber|chaconne_wide|vocoder|"
                        "test_small|tiny)")
    p.add_argument("--n-fft", type=int, default=1024,
                   help="mel STFT size (conditioned configs)")
    p.add_argument("--hop-length", type=int, default=256,
                   help="mel hop in samples (conditioned configs)")
    p.add_argument("--cond-upsample", default=None,
                   help="comma-separated stride factors enabling the "
                        "learnable conditioning upsampler, e.g. 16,16 — "
                        "their product must equal --hop-length (default: "
                        "non-learned linear interpolation)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 matmul inputs + residual-stream storage "
                        "in the training trunk (cfg.compute_dtype / "
                        "cfg.stream_dtype); ~3%% faster at chaconne widths, "
                        "accumulation stays f32")
    p.add_argument("--trunk-kernel", action="store_true",
                   help="fused Pallas training trunk (cfg.trunk_kernel): "
                        "the whole layer walk runs VMEM-resident in one "
                        "kernel — 1.5-1.7x faster train steps at chaconne "
                        "widths; local conditioning (vocoder) rides "
                        "in-kernel, global-cond models fall back to the "
                        "XLA trunk")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--optimizer", default="adam",
                   choices=["adam", "sgd_normalized"],
                   help="adam (the reference trainer's default, "
                        "wavenet_training.py:24) or the reference's "
                        "SGDNormalized (optimizers.py:4)")
    p.add_argument("--momentum", type=float, default=0.0,
                   help="sgd_normalized momentum")
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--clip", type=float, default=None)
    p.add_argument("--lr-schedule", default="constant",
                   choices=("constant", "cosine", "exponential"),
                   help="cosine decays to lr*min-lr-ratio over "
                        "--decay-steps; exponential multiplies by "
                        "min-lr-ratio every decay-steps")
    p.add_argument("--warmup-steps", type=int, default=0,
                   help="linear 0 -> lr ramp before the schedule")
    p.add_argument("--decay-steps", type=int, default=None)
    p.add_argument("--min-lr-ratio", type=float, default=0.0)
    p.add_argument("--accum-steps", type=int, default=1,
                   help="gradient accumulation: apply the optimizer every "
                        "k micro-batches (effective batch = k * "
                        "batch-size without k * the activation memory)")
    p.add_argument("--ema-decay", type=float, default=None,
                   help="track an exponential moving average of the "
                        "weights in the optimizer state (e.g. 0.9995); "
                        "generate from it with generate.py --ema")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--test-stride", type=int, default=500)
    p.add_argument("--snapshot-path", default="snapshots")
    p.add_argument("--snapshot-name", default=None)
    p.add_argument("--snapshot-interval", type=int, default=1000)
    p.add_argument("--log-dir", default=None, help="TensorBoard log dir")
    p.add_argument("--log-interval", type=int, default=200)
    p.add_argument("--validation-interval", type=int, default=400)
    p.add_argument("--generate-interval", type=int, default=800)
    p.add_argument("--generate-length", type=int, default=32000)
    p.add_argument("--resume", action="store_true",
                   help="continue from the newest snapshot")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--mesh-data", type=int, default=0,
                   help="data-axis size (0 = all devices)")
    p.add_argument("--mesh-model", type=int, default=1)
    return p.parse_args()


def main():
    from pytorch_wavenet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # restarts reload compiled programs from disk
    args = parse_args()
    import pytorch_wavenet_tpu as wt
    from pytorch_wavenet_tpu.utils.visualize import param_summary

    overrides = {}
    if args.cond_upsample:
        overrides["cond_upsample"] = tuple(
            int(r) for r in args.cond_upsample.split(",")
        )
    if args.bf16:
        overrides["compute_dtype"] = jnp.bfloat16
        overrides["stream_dtype"] = jnp.bfloat16
    if args.trunk_kernel:
        overrides["trunk_kernel"] = True
    cfg = wt.get_config(args.config, **overrides)
    params = wt.init_wavenet(jax.random.PRNGKey(args.seed), cfg)
    print(f"config: {args.config} {cfg}")
    print(f"receptive field: {cfg.receptive_field}")
    print(f"parameter count: {cfg.parameter_count():,}")
    print(param_summary(params))

    dataset_file = args.dataset_file or os.path.join(args.data_dir, "dataset.npz")
    ds_kwargs = dict(
        dataset_file=dataset_file,
        item_length=cfg.item_length,
        target_length=cfg.output_length,
        file_location=args.data_dir,
        classes=cfg.classes,
        test_stride=args.test_stride,
    )
    if cfg.cond_channels:
        # conditioned config (e.g. the vocoder preset): the dataset also
        # computes log-mel frames per window; the jitted train step
        # upsamples them on device (learnably when --cond-upsample is set)
        from pytorch_wavenet_tpu.data.mel_dataset import MelWaveNetDataset

        data = MelWaveNetDataset(
            **ds_kwargs,
            num_mels=cfg.cond_channels,
            n_fft=args.n_fft,
            hop_length=args.hop_length,
        )
    else:
        data = wt.WaveNetDataset(**ds_kwargs)
    print(f"the dataset has {len(data)} items")

    snapshot_name = args.snapshot_name or f"{args.config}_model"

    def generate_and_log_samples(step):
        """Async generation from the latest snapshot at several temperatures
        (reference: train_script.py:46-61)."""
        blob = wt.load_latest_model_from(args.snapshot_path)
        gen_params = blob["params"]
        gen_cfg = blob["config"] or cfg
        print("start generating...")
        for temp in (0.5, 1.0):
            samples = wt.generate_audio(
                gen_params, gen_cfg, length=args.generate_length,
                temperatures=[temp], seed=step,
            )
            if logger_is_tb:
                logger.audio_summary(f"temperature_{temp}", samples, step, sr=16000)
        print("audio clips generated")

    logger_is_tb = args.log_dir is not None
    if logger_is_tb:
        logger = wt.TensorboardLogger(
            log_interval=args.log_interval,
            validation_interval=args.validation_interval,
            generate_interval=args.generate_interval,
            generate_function=generate_and_log_samples,
            log_dir=args.log_dir,
        )
    else:
        logger = wt.Logger(
            log_interval=args.log_interval,
            validation_interval=args.validation_interval,
            generate_interval=args.generate_interval,
            generate_function=generate_and_log_samples,
        )

    mesh = None
    if args.mesh_data > 0:
        from pytorch_wavenet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh_data, args.mesh_model)
        print(f"mesh: {dict(mesh.shape)}")

    from pytorch_wavenet_tpu.training.optimizers import (
        lr_schedule,
        reference_adam,
    )

    lr = lr_schedule(args.lr, args.lr_schedule, args.warmup_steps,
                     args.decay_steps, args.min_lr_ratio)
    if args.optimizer == "sgd_normalized":
        if not isinstance(lr, float):
            raise SystemExit("--lr-schedule/--warmup-steps only apply to "
                             "the adam optimizer")
        optimizer = wt.sgd_normalized(
            lr=args.lr, momentum=args.momentum,
            weight_decay=args.weight_decay,
        )
    else:
        optimizer = reference_adam(lr, args.weight_decay, args.clip)
    if args.ema_decay:
        from pytorch_wavenet_tpu.training.optimizers import with_ema

        # inside MultiSteps, so the average moves once per APPLIED update
        optimizer = with_ema(optimizer, args.ema_decay)
    if args.accum_steps > 1:
        import optax

        optimizer = optax.MultiSteps(
            optimizer, every_k_schedule=args.accum_steps)

    trainer = wt.WaveNetTrainer(
        cfg,
        params,
        data,
        optimizer=optimizer,
        lr=args.lr,
        weight_decay=args.weight_decay,
        gradient_clipping=args.clip,
        logger=logger,
        snapshot_path=args.snapshot_path,
        snapshot_name=snapshot_name,
        snapshot_interval=args.snapshot_interval,
        seed=args.seed,
        mesh=mesh,
    )

    start_step = 0
    if args.resume:
        start_step = trainer.resume()
        print(f"resuming at step {start_step}")

    print("start training...")
    trainer.train(
        batch_size=args.batch_size,
        epochs=args.epochs,
        continue_training_at_step=start_step,
        max_steps=args.max_steps,
    )


if __name__ == "__main__":
    main()
