#!/usr/bin/env python
"""Parallel-WaveNet distillation entry point.

Distills a trained AR teacher snapshot (scripts/train.py output) into an
IAF student (models/iaf.py) via probability density distillation
(training/distill.py), then the student generates audio in one parallel
pass per clip — no autoregression. Beyond the reference's scope
(docs/ROADMAP.md capability item); the teacher flow it builds on is the
reference's train/generate loop (train_script.py, wavenet_model.py:237).

Examples:
  python scripts/distill.py --teacher-snapshot snapshots/chaconne_*.ckpt \
      --steps 5000 --batch-size 4 --length 4000 --out-dir students
  python scripts/distill.py --teacher-snapshot snapshots --generate 16000 \
      --student-snapshot students/student_*.ckpt --wav-out student.wav
"""

import os

if os.environ.get("WAVENET_TPU_FORCE_CPU"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--teacher-snapshot", required=True,
                   help="teacher .ckpt file or snapshot directory (newest "
                        "is used)")
    p.add_argument("--teacher-ema", action="store_true",
                   help="distill against the teacher's EMA weights "
                        "(train.py --ema-decay)")
    p.add_argument("--flows", type=int, default=4)
    p.add_argument("--layers", type=int, default=10)
    p.add_argument("--blocks", type=int, default=1)
    p.add_argument("--width", type=int, default=64,
                   help="student residual/dilation/skip/end channels")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--length", type=int, default=4000,
                   help="student draw length per step (must exceed the "
                        "teacher receptive field)")
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--power-weight", type=float, default=0.0,
                   help="power-loss weight (needs --data-dir for reference "
                        "audio)")
    p.add_argument("--hop-length", type=int, default=256,
                   help="mel hop for conditioned (vocoder) teachers")
    p.add_argument("--n-fft", type=int, default=1024)
    p.add_argument("--data-dir", default=None,
                   help="audio dir for power-loss reference batches")
    p.add_argument("--dataset-file", default=None)
    p.add_argument("--rms-weight", type=float, default=None,
                   help="log-RMS matching weight, the dedicated amplitude "
                        "regulator (the log-power-spectrum loss alone is "
                        "an unstable level control — see "
                        "training/distill.py). Default: 1.0 when "
                        "--data-dir is given, else 0")
    p.add_argument("--teacher-smooth", type=float, default=1e-3,
                   help="teacher label smoothing — required against sharp "
                        "teachers (unsmoothed, the KL's cheapest descent "
                        "widens the student to uniform and gradients die; "
                        "see training/distill.py distill_loss)")
    p.add_argument("--init-scale", type=float, default=None,
                   help="fresh-student draw amplitude at init (default: "
                        "data_rms/1.81 when --data-dir is given, else "
                        "0.1). Logistic(0,1) noise sits in the mu-law "
                        "teacher's flat log-prob region where "
                        "distillation stalls — start at data scale")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out-dir", default="students")
    p.add_argument("--name", default="student")
    p.add_argument("--save-interval", type=int, default=1000)
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--student-snapshot", default=None,
                   help="resume/generate from this student .ckpt")
    p.add_argument("--generate", type=int, default=0,
                   help="after training (or with --steps 0: immediately), "
                        "generate this many samples per stream")
    p.add_argument("--streams", type=int, default=1)
    p.add_argument("--wav-out", default=None)
    return p.parse_args()


def load_teacher(path, ema: bool = False):
    from pytorch_wavenet_tpu.utils.checkpoints import (
        latest_checkpoint,
        load_checkpoint,
    )

    if os.path.isdir(path):
        path = latest_checkpoint(path)
        if path is None:
            raise SystemExit("no teacher checkpoint found")
    blob = load_checkpoint(path)
    if blob["config"] is None:
        raise SystemExit(f"{path} has no embedded config")
    import pytorch_wavenet_tpu as wt

    source = blob["params"]
    if ema:
        from pytorch_wavenet_tpu.training.optimizers import (
            find_ema_state_dict,
        )

        source = find_ema_state_dict(blob.get("opt_state"))
        if source is None:
            raise SystemExit("--teacher-ema: snapshot carries no EMA "
                             "weights (train with --ema-decay)")
    template = wt.init_wavenet(jax.random.PRNGKey(0), blob["config"])
    from flax import serialization

    params = serialization.from_state_dict(template, source)
    print(f"teacher: {path} (step {blob['step']}, "
          f"rf {blob['config'].receptive_field})")
    return params, blob["config"]


def load_student(path, scfg):
    from pytorch_wavenet_tpu.models.iaf import load_student_snapshot

    return load_student_snapshot(path, scfg)


def main():
    from pytorch_wavenet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # restarts reload compiled programs from disk
    args = parse_args()
    from pytorch_wavenet_tpu.models.iaf import (
        IAFConfig,
        init_student,
        student_generate,
        student_parameter_count,
    )
    from pytorch_wavenet_tpu.training.distill import distill_step
    from pytorch_wavenet_tpu.utils.checkpoints import save_checkpoint

    teacher, tcfg = load_teacher(args.teacher_snapshot, args.teacher_ema)
    if tcfg.cond_channels and args.data_dir is None:
        raise SystemExit(
            "a conditioned (vocoder) teacher distills on real mel "
            "timelines — pass --data-dir"
        )
    scfg = IAFConfig(
        flows=args.flows, layers=args.layers, blocks=args.blocks,
        residual_channels=args.width, dilation_channels=args.width,
        skip_channels=args.width, end_channels=args.width,
        cond_channels=tcfg.cond_channels,
    )
    step0 = 0
    if args.student_snapshot:
        params, scfg, step0 = load_student(args.student_snapshot, scfg)
        print(f"student resumed at step {step0}")
        if scfg.cond_channels != tcfg.cond_channels:
            raise SystemExit(
                f"resumed student has cond_channels="
                f"{scfg.cond_channels} but the teacher expects "
                f"{tcfg.cond_channels} — distill a matching student")
    else:
        params = None  # fresh init below, once the data rms is known
    if args.length <= tcfg.receptive_field:
        raise SystemExit(
            f"--length {args.length} must exceed teacher rf "
            f"{tcfg.receptive_field}"
        )

    ref_iter = None
    cond_iter = None
    if args.rms_weight is None:
        args.rms_weight = 1.0 if args.data_dir is not None else 0.0
    needs_ref = args.power_weight > 0.0 or args.rms_weight > 0.0
    if needs_ref and args.data_dir is None:
        raise SystemExit("--power-weight / --rms-weight need --data-dir")
    if args.data_dir is not None and (needs_ref or tcfg.cond_channels):
        from pytorch_wavenet_tpu.data.dataset import (
            BatchIterator,
            WaveNetDataset,
        )
        from pytorch_wavenet_tpu.ops.mulaw import dequantize_data

        ds = WaveNetDataset(
            args.dataset_file or os.path.join(args.data_dir, "dataset.npz"),
            item_length=args.length - 1, target_length=1,
            file_location=args.data_dir, classes=tcfg.classes,
        )

        def ref_batches():
            while True:
                for x, _ in BatchIterator(ds, args.batch_size,
                                          seed=args.seed):
                    yield jnp.asarray(
                        dequantize_data(x, tcfg.classes), jnp.float32
                    )

        ref_iter = ref_batches()
        if tcfg.cond_channels:
            # vocoder distillation: both models see the mel timeline of a
            # REAL audio window; the power reference is the same window
            from pytorch_wavenet_tpu.ops.mel import (
                log_mel_spectrogram,
                upsample_frames_np,
            )

            def cond_batches():
                import numpy as np

                while True:
                    ref = np.asarray(next(ref_iter))
                    mels = np.stack([
                        log_mel_spectrogram(
                            w, num_mels=tcfg.cond_channels,
                            n_fft=args.n_fft, hop_length=args.hop_length,
                        ) for w in ref
                    ])
                    rows = upsample_frames_np(
                        mels, args.hop_length, args.length)
                    yield jnp.asarray(ref), jnp.asarray(rows, jnp.float32)

            cond_iter = cond_batches()

    if params is None:
        iscale = args.init_scale
        if iscale is None:
            if ref_iter is not None:  # amplitude-matched init (see --help)
                iscale = float(jnp.sqrt(jnp.mean(next(ref_iter) ** 2)))
                iscale /= 1.8138  # Logistic(0,1) std
            else:
                iscale = 0.1
        params = init_student(jax.random.PRNGKey(args.seed), scfg,
                              init_scale=iscale)
        print(f"student init_scale {iscale:.4f}")
    print(f"student: {scfg.flows} flows x {scfg.num_layers} layers, "
          f"{student_parameter_count(params):,} params "
          f"(teacher {sum(int(x.size) for x in jax.tree_util.tree_leaves(teacher)):,})")

    import optax

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(args.lr))
    opt = tx.init(params)
    key = jax.random.PRNGKey(args.seed + 1)

    t0 = time.time()
    for i in range(step0, step0 + args.steps):
        cond = None
        if cond_iter is not None:
            ref, cond = next(cond_iter)
        else:
            ref = next(ref_iter) if ref_iter is not None else None
        params, opt, loss, aux = distill_step(
            params, opt, teacher, scfg, tcfg, tx,
            jax.random.fold_in(key, i), args.batch_size, args.length,
            cond=cond,
            audio_ref=ref if needs_ref else None,
            power_weight=args.power_weight,
            rms_weight=args.rms_weight,
            teacher_smooth=args.teacher_smooth,
        )
        if (i + 1) % args.log_interval == 0 or i == step0:
            loss = float(loss)
            msg = f"step {i + 1}: loss {loss:.4f} kl {float(aux['kl']):.4f}"
            if "power" in aux:
                msg += f" power {float(aux['power']):.4f}"
            msg += f" rms {float(aux['rms']):.3f}"
            msg += f" ({(time.time() - t0) / (i - step0 + 1):.3f} s/step)"
            print(msg, flush=True)
        if (i + 1) % args.save_interval == 0:
            save_checkpoint(
                args.out_dir, args.name, i + 1, params,
                extra={"iaf_config": dataclasses.asdict(
                    dataclasses.replace(scfg, compute_dtype=None))},
            )
    if args.steps:
        path = save_checkpoint(
            args.out_dir, args.name, step0 + args.steps, params,
            extra={"iaf_config": dataclasses.asdict(
                dataclasses.replace(scfg, compute_dtype=None))},
        )
        print(f"saved {path}")

    if args.generate:
        t0 = time.time()
        gen_cond = None
        if scfg.cond_channels and cond_iter is not None:
            # conditioned student: demo clip is copy-synthesis of a real
            # window's mel timeline (free-running mels don't exist)
            _, rows = next(cond_iter)
            n = min(args.generate, rows.shape[1])
            gen_cond = jnp.broadcast_to(
                rows[:1, :n], (args.streams, n, rows.shape[2]))
            args.generate = n
        wav = student_generate(params, scfg, jax.random.PRNGKey(args.seed),
                               args.generate, num_streams=args.streams,
                               cond=gen_cond)
        wav = np.asarray(wav)
        dt = time.time() - t0
        print(f"generated {wav.size} samples in {dt:.3f}s "
              f"({wav.size / dt:,.0f} samples/s, one parallel pass)")
        if args.wav_out:
            from pytorch_wavenet_tpu.data.audio_io import write_wav

            write_wav(args.wav_out, wav[0], 16000)
            print(f"wrote {args.wav_out}")


if __name__ == "__main__":
    main()
