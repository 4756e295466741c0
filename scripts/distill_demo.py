#!/usr/bin/env python
"""End-to-end distillation quality demo: teacher -> IAF student, measured.

Runs the full Parallel-WaveNet pipeline on seeded synthetic audio and
records the quality metrics docs/PERF.md cites:

1. synthesize a deterministic 60 s "melody" (seeded pentatonic random walk
   over three harmonics);
2. train a demo AR teacher (mu-law categorical WaveNet) on random windows;
3. distill an IAF student against the frozen teacher (probability density
   distillation + power loss, training/distill.py);
4. evaluate:
   * KL trajectory: mean teacher||student bin-KL over the first vs the
     last ``--eval-steps`` distillation steps;
   * whisper check: student draw RMS vs the data RMS (pure-KL students
     collapse to near-silence — the power loss is what holds this ratio
     near 1);
   * log-mel L2: distance between time-averaged log-mel spectra of student
     draws and held-out data, with the *teacher's own rollouts* scored the
     same way as the reference point (the student can't beat the teacher —
     parity with it is success);
   * vocoder mode (``--mode vocoder``): both models synthesize from the
     held-out segment's mel timeline and the metric is per-frame log-mel
     L2 against that target — the actual vocoding error.

The reference has no distillation (its generation is the AR loop,
wavenet_model.py:237); this measures the beyond-reference capability the
IAF student adds. Defaults finish in minutes on a v5e; the numbers land
in docs/PERF.md.

Examples:
  python scripts/distill_demo.py --mode uncond --json
  python scripts/distill_demo.py --mode vocoder --json
  WAVENET_TPU_FORCE_CPU=1 python scripts/distill_demo.py --mode uncond \
      --teacher-steps 30 --distill-steps 30 --smoke  # CPU smoke
"""

import os

if os.environ.get("WAVENET_TPU_FORCE_CPU"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=("uncond", "vocoder"), default="uncond")
    p.add_argument("--seconds", type=float, default=60.0)
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--teacher-steps", type=int, default=4000)
    p.add_argument("--distill-steps", type=int, default=4000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--distill-batch", type=int, default=4)
    p.add_argument("--distill-length", type=int, default=4000)
    p.add_argument("--power-weight", type=float, default=0.03,
                   help="power-loss weight. Measured: 0.1 drowns the KL "
                        "gradient (amplitude ratchets up and the KL "
                        "plateaus in the teacher's saturated flat "
                        "region); 0.01-0.03 both drops KL ~2.5x from the "
                        "matched init AND holds rms near the data's")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--distill-lr", type=float, default=3e-4,
                   help="1e-3 measured unstable at chaconne scale "
                        "(KL rises); 3e-4 descends cleanly")
    p.add_argument("--distill-lr-schedule", default="constant",
                   choices=("constant", "cosine"),
                   help="cosine decays to 0.1x over --distill-steps")
    p.add_argument("--rms-weight", type=float, default=None,
                   help="log-RMS matching weight — the dedicated "
                        "amplitude regulator (see distill_loss). Default "
                        "3.0 uncond / 6.0 vocoder: the measured per-item "
                        "equilibrium sweep at demo scale read 0.80x data "
                        "RMS at 3, 0.97x at 6, 1.13x at 10 (PERF.md)")
    p.add_argument("--teacher-smooth", type=float, default=1e-3,
                   help="teacher label smoothing during distillation — "
                        "REQUIRED at scale against sharp teachers (see "
                        "training/distill.py distill_loss: unsmoothed, "
                        "the KL's cheapest descent is widening the "
                        "student to uniform, a dead-gradient plateau)")
    p.add_argument("--eval-steps", type=int, default=50,
                   help="steps averaged for the start/end KL readings")
    p.add_argument("--eval-samples", type=int, default=32000,
                   help="per-stream eval rollout length")
    p.add_argument("--eval-streams", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--student-flows", type=int, default=None,
                   help="IAF flow count (default: the demo's 4) — the "
                        "round-5 capacity-sweep axis")
    p.add_argument("--student-width", type=int, default=None,
                   help="IAF channel width (residual/dilation/skip/end; "
                        "default 64)")
    p.add_argument("--student-layers", type=int, default=None,
                   help="IAF layers per block (default 10)")
    p.add_argument("--student-blocks", type=int, default=None,
                   help="IAF blocks (default 1; 2 doubles the per-flow "
                        "receptive field — the deeper-dilation sweep cell)")
    p.add_argument("--rms-per-item", action="store_true",
                   help="per-draw level regulation (each draw pinned to "
                        "its ref window's RMS) even in uncond mode — the "
                        "vocoder mode's regulator; for uncond it acts as "
                        "a lower-variance level pin")
    p.add_argument("--teacher-width", type=int, default=None,
                   help="demo teacher residual/dilation channels "
                        "(default 32) — the jointly-scaled-teacher axis")
    p.add_argument("--teacher-ckpt", default=None,
                   help="reuse a saved demo teacher (from --out-dir) "
                        "instead of retraining — the capacity sweep holds "
                        "the teacher fixed across student cells")
    p.add_argument("--out-dir", default=None,
                   help="save teacher/student ckpts and eval wavs here")
    p.add_argument("--json", action="store_true")
    p.add_argument("--smoke", action="store_true",
                   help="tiny model sizes (CPU test path)")
    return p.parse_args()


def make_melody(seconds: float, sr: int, seed: int) -> np.ndarray:
    """Seeded pentatonic random walk, three harmonics, per-note envelope."""
    rng = np.random.default_rng(seed)
    scale = 220.0 * 2.0 ** (np.array([0, 2, 4, 7, 9]) / 12.0)
    note_len = sr // 4
    n_notes = int(seconds * sr) // note_len + 1
    idx = np.cumsum(rng.integers(-2, 3, n_notes)) % len(scale)
    f0 = np.repeat(scale[idx], note_len)[: int(seconds * sr)]
    t = np.arange(len(f0)) / sr
    phase = 2 * np.pi * np.cumsum(f0) / sr
    env = 0.4 + 0.2 * np.sin(2 * np.pi * np.arange(len(f0)) / note_len)
    wav = env * (np.sin(phase) + 0.5 * np.sin(2 * phase)
                 + 0.25 * np.sin(3 * phase)) / 1.75
    return wav.astype(np.float32)


def mel_l2(a_mel: np.ndarray, b_mel: np.ndarray) -> float:
    """Mean squared distance between log-mel frames (same shape)."""
    n = min(a_mel.shape[-2], b_mel.shape[-2])
    return float(np.mean((a_mel[..., :n, :] - b_mel[..., :n, :]) ** 2))


def main():
    from pytorch_wavenet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    args = parse_args()
    if args.rms_weight is None:
        # per-mode equilibrium (see --rms-weight help): the per-item
        # regulator needs a stronger pin against the conditioned KL
        args.rms_weight = 6.0 if args.mode == "vocoder" else 3.0
    import optax

    import pytorch_wavenet_tpu as wt
    from pytorch_wavenet_tpu.models.generate import generate_fast
    from pytorch_wavenet_tpu.models.iaf import (
        IAFConfig,
        init_student,
        student_generate,
    )
    from pytorch_wavenet_tpu.ops import mel as mel_ops
    from pytorch_wavenet_tpu.ops.mulaw import quantize_data
    from pytorch_wavenet_tpu.training.distill import distill_loss, distill_step
    from pytorch_wavenet_tpu.training.trainer import train_step

    t_wall = time.time()
    wav = make_melody(args.seconds, args.sr, args.seed)
    split = int(len(wav) * 0.8)
    train_wav, held_wav = wav[:split], wav[split:]

    # mel features (vocoder mode conditions on these; eval uses them in
    # both modes). hop such that the upsampled timeline is exact.
    n_mels, n_fft, hop = (16, 256, 64) if args.smoke else (32, 512, 64)
    melspec = lambda w: mel_ops.log_mel_spectrogram(  # noqa: E731
        w, num_mels=n_mels, n_fft=n_fft, hop_length=hop,
        sampling_rate=args.sr)

    if args.smoke:
        tcfg = wt.get_config("tiny", output_length=64,
                             cond_channels=n_mels if args.mode == "vocoder"
                             else 0)
        scfg = IAFConfig(flows=2, layers=3, blocks=1, residual_channels=8,
                         dilation_channels=8, skip_channels=8,
                         end_channels=8,
                         cond_channels=tcfg.cond_channels)
    else:
        tw = args.teacher_width or 32
        tcfg = wt.WaveNetConfig(
            layers=9, blocks=2, dilation_channels=tw, residual_channels=tw,
            skip_channels=512, end_channels=256, output_length=1024,
            bias=True,
            cond_channels=n_mels if args.mode == "vocoder" else 0)
        scfg = IAFConfig(flows=4, layers=10, blocks=1, residual_channels=64,
                         dilation_channels=64, skip_channels=64,
                         end_channels=64, cond_channels=tcfg.cond_channels)
    if not args.smoke:
        w = args.student_width or scfg.residual_channels
        scfg = dataclasses.replace(
            scfg,
            flows=args.student_flows or scfg.flows,
            layers=args.student_layers or scfg.layers,
            blocks=args.student_blocks or scfg.blocks,
            residual_channels=w, dilation_channels=w,
            skip_channels=w, end_channels=w,
        )
    rf = tcfg.receptive_field
    print(f"mode={args.mode} teacher rf={rf} params={tcfg.parameter_count():,}",
          flush=True)

    classes = tcfg.classes
    q = quantize_data(train_wav, classes).astype(np.int32)  # class stream
    cond_full = None
    if args.mode == "vocoder":
        frames = melspec(train_wav)  # (F, n_mels)
        cond_full = np.asarray(
            mel_ops.upsample_frames_np(frames[None], hop, len(train_wav))
        )[0]  # (T, n_mels), sample-rate timeline

    # ---------------- teacher training (random windows, donated step)
    key = jax.random.PRNGKey(args.seed)
    params = wt.init_wavenet(key, tcfg)
    tx = wt.reference_adam(args.lr)
    opt = tx.init(params)
    item, out_len = tcfg.item_length, tcfg.output_length
    rng = np.random.default_rng(args.seed + 1)
    B = args.batch_size
    loss = None
    if args.teacher_ckpt:
        from pytorch_wavenet_tpu.utils.checkpoints import load_checkpoint

        ck = load_checkpoint(args.teacher_ckpt)
        if ck["config"] != tcfg:
            raise SystemExit(
                f"--teacher-ckpt config {ck['config']} != demo teacher "
                f"{tcfg}")
        params = jax.tree_util.tree_map(jnp.asarray, ck["params"])
        # keep the data-rng stream identical to the trained path so the
        # distillation windows match cell-for-cell across the sweep
        for step in range(args.teacher_steps):
            rng.integers(0, len(q) - item - 1, B)
        args.teacher_steps = 0
        print("teacher: loaded from checkpoint", flush=True)
    for step in range(args.teacher_steps):
        starts = rng.integers(0, len(q) - item - 1, B)
        x = np.stack([q[s : s + item] for s in starts])
        y = np.stack([q[s + item - out_len + 1 : s + item + 1] for s in starts])
        cond = None
        if cond_full is not None:
            cond = jnp.asarray(
                np.stack([cond_full[s : s + item] for s in starts]))
        params, opt, loss, _ = train_step(
            params, opt, tcfg, tx, jnp.asarray(x), jnp.asarray(y), cond=cond)
        if step % 500 == 0 or step == args.teacher_steps - 1:
            print(f"teacher step {step}: loss {float(loss):.3f}", flush=True)
    teacher_loss = float(loss) if loss is not None else float("nan")

    # ---------------- distillation
    # amplitude-matched init: Logistic(0,1) noise (std ~1.81) sits in the
    # mu-law teacher's FLAT log-prob region, where distillation stalls
    data_rms = float(np.sqrt(np.mean(train_wav**2)))
    student = init_student(jax.random.PRNGKey(args.seed + 2), scfg,
                           init_scale=data_rms / 1.8138)
    student_init = jax.tree_util.tree_map(jnp.copy, student)
    if args.distill_lr_schedule == "cosine":
        lr = optax.cosine_decay_schedule(
            args.distill_lr, args.distill_steps, alpha=0.1)
    else:
        lr = args.distill_lr
    stx = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adam(lr))
    sopt = stx.init(student)
    dlen = max(args.distill_length, rf + 257)
    dB = args.distill_batch
    audio_ref_np = np.stack([
        train_wav[s : s + dlen] for s in
        rng.integers(0, len(train_wav) - dlen - 1, dB)
    ])
    kls, rmss = [], []
    audio_ref = jnp.asarray(audio_ref_np)
    for step in range(args.distill_steps):
        cond = None
        ref_step = audio_ref
        if cond_full is not None:
            # conditioned mode: audio_ref rides the SAME windows as cond,
            # so the per-item rms regulator pins each draw's level to its
            # own window's level (the scalar batch-marginal regulator let
            # the student run 25% hot on held-out mels — see
            # training/distill.py rms_per_item)
            starts = rng.integers(0, len(train_wav) - dlen - 1, dB)
            cond = jnp.asarray(
                np.stack([cond_full[s : s + dlen] for s in starts]))
            ref_step = jnp.asarray(
                np.stack([train_wav[s : s + dlen] for s in starts]))
        student, sopt, dl, aux = distill_step(
            student, sopt, params, scfg, tcfg, stx,
            jax.random.fold_in(jax.random.PRNGKey(args.seed + 3), step),
            dB, dlen, cond=cond, audio_ref=ref_step,
            power_weight=args.power_weight, rms_weight=args.rms_weight,
            teacher_smooth=args.teacher_smooth,
            rms_per_item=args.rms_per_item or cond_full is not None)
        kls.append(float(aux["kl"]))
        rmss.append(float(aux["rms"]))
        if step % 500 == 0 or step == args.distill_steps - 1:
            print(f"distill step {step}: kl {kls[-1]:.3f} "
                  f"rms {rmss[-1]:.3f}", flush=True)
    ev = min(args.eval_steps, max(1, len(kls) // 4))
    kl_start, kl_end = float(np.mean(kls[:ev])), float(np.mean(kls[-ev:]))

    # ---------------- evaluation
    n_eval = args.eval_samples if not args.smoke else 2048
    streams = args.eval_streams if not args.smoke else 2
    data_rms = float(np.sqrt(np.mean(held_wav**2)))
    ekey = jax.random.PRNGKey(args.seed + 4)

    if args.mode == "uncond":
        s_wav = np.asarray(student_generate(student, scfg, ekey, n_eval,
                                            num_streams=streams))
        t_wav = np.asarray(generate_fast(
            params, tcfg, ekey, n_eval,
            jnp.full((streams, 1), classes // 2, jnp.int32),
            temperature=1.0)[0])
        # distribution-level: time-averaged log-mel spectra vs held-out data
        avg = lambda w: melspec(w).mean(axis=-2)  # noqa: E731
        ref_avg = avg(held_wav)
        logmel_student = float(np.mean((avg(s_wav).mean(0) - ref_avg) ** 2))
        logmel_teacher = float(np.mean((avg(t_wav).mean(0) - ref_avg) ** 2))
        i_wav = np.asarray(student_generate(student_init, scfg, ekey,
                                            n_eval, num_streams=streams))
        logmel_init = float(np.mean((avg(i_wav).mean(0) - ref_avg) ** 2))
    else:
        # vocode the held-out mel timeline; score against that target mel
        tgt = held_wav[: n_eval + rf]
        frames = melspec(tgt)
        cond_t = np.asarray(
            mel_ops.upsample_frames_np(frames[None], hop, len(tgt)))[0]
        c1 = jnp.asarray(cond_t)[None]
        # several noise draws on the SAME mel timeline: a single draw's
        # RMS is too noisy to read the level calibration against (run-to-
        # run 1-stream ratios measured 0.80 and 1.13 at identical recipe)
        cS = jnp.tile(c1, (streams, 1, 1))
        s_wav = np.asarray(student_generate(
            student, scfg, ekey, len(tgt), num_streams=streams, cond=cS))
        t_wav = np.asarray(generate_fast(
            params, tcfg, ekey, len(tgt) - rf,
            jnp.asarray(quantize_data(tgt[:rf], classes))[None].astype(
                jnp.int32),
            # row t conditions the step consuming input sample t: an
            # rf-primed rollout of len(tgt)-rf samples uses len(tgt)-1 rows
            temperature=1.0, cond=c1[:, :-1])[0])
        ref_mel = melspec(tgt)
        logmel_student = float(np.mean(
            [mel_l2(melspec(w), ref_mel) for w in s_wav]))
        logmel_teacher = mel_l2(melspec(t_wav[0]),
                                melspec(tgt[rf:]))
        i_wav = np.asarray(student_generate(
            student_init, scfg, ekey, len(tgt), num_streams=streams,
            cond=cS))
        logmel_init = float(np.mean(
            [mel_l2(melspec(w), ref_mel) for w in i_wav]))
    student_rms = float(np.sqrt(np.mean(s_wav**2)))

    metrics = {
        "mode": args.mode,
        "teacher_steps": args.teacher_steps,
        "teacher_final_loss": round(teacher_loss, 4),
        "distill_steps": args.distill_steps,
        "kl_start": round(kl_start, 4),
        "kl_end": round(kl_end, 4),
        "data_rms": round(data_rms, 4),
        "student_rms": round(student_rms, 4),
        "rms_ratio": round(student_rms / max(data_rms, 1e-9), 3),
        "logmel_l2_student": round(logmel_student, 4),
        "logmel_l2_init": round(logmel_init, 4),
        "logmel_l2_teacher": round(logmel_teacher, 4),
        "wall_s": round(time.time() - t_wall, 1),
    }
    print(f"KL {kl_start:.3f} -> {kl_end:.3f} | rms ratio "
          f"{metrics['rms_ratio']} | log-mel L2 student "
          f"{logmel_student:.4f} (init {logmel_init:.4f}, "
          f"teacher {logmel_teacher:.4f})")
    if args.json:
        print(json.dumps(metrics))
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
        from pytorch_wavenet_tpu.data.audio_io import write_wav
        from pytorch_wavenet_tpu.utils.checkpoints import save_checkpoint

        save_checkpoint(args.out_dir, f"demo_teacher_{args.mode}",
                        args.teacher_steps, params, cfg=tcfg)
        write_wav(os.path.join(args.out_dir, f"student_{args.mode}.wav"),
                  np.clip(np.asarray(s_wav[0]), -1, 1), args.sr)
        with open(os.path.join(args.out_dir,
                               f"metrics_{args.mode}.json"), "w") as f:
            json.dump(metrics, f)
    return metrics


if __name__ == "__main__":
    main()
