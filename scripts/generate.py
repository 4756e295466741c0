#!/usr/bin/env python
"""Generation entry point (the reference's generate_script.py as a CLI).

Loads the newest snapshot, primes from a dataset window, generates with
Fast-WaveNet on device, writes a wav.

Example:
  python scripts/generate.py --snapshot-path snapshots \
      --data-dir train_samples/bach_chaconne --num-samples 16000 \
      --temperature 1.0 --out latest_generated_clip.wav
"""

import os

if os.environ.get("WAVENET_TPU_FORCE_CPU"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import argparse
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--snapshot-path", default="snapshots")
    p.add_argument("--snapshot", default=None, help="explicit checkpoint file")
    p.add_argument("--torch-snapshot", default=None,
                   help="a reference torch snapshot (whole-module pickle or "
                        "bare state dict) converted on load")
    p.add_argument("--torch-layers", type=int, default=None,
                   help="layers-per-block for bare state dicts (whole-module "
                        "pickles carry it)")
    p.add_argument("--torch-blocks", type=int, default=None)
    p.add_argument("--data-dir", default=None,
                   help="dataset dir to prime from (reference primes from "
                        "item 250000, generate_script.py:19-20)")
    p.add_argument("--prime-index", type=int, default=0)
    p.add_argument("--num-samples", type=int, default=16000)
    p.add_argument("--mel-file", default=None,
                   help="npy of log-mel frames (F, M) or (S, F, M): run the "
                        "conditioned vocoder over them (model must have "
                        "cond_channels == M)")
    p.add_argument("--vocode-wav", default=None,
                   help="copy-synthesis: featurize this wav to log-mels and "
                        "re-synthesize it through the vocoder")
    p.add_argument("--hop-length", type=int, default=256,
                   help="mel hop in samples (vocoder modes)")
    p.add_argument("--n-fft", type=int, default=1024,
                   help="mel STFT size (--vocode-wav)")
    p.add_argument("--num-streams", type=int, default=1)
    p.add_argument("--exact-chain", action="store_true",
                   help="fused kernels: keep the exact per-layer dot chain "
                        "instead of the fuse_res rewrite (~1.5x on the "
                        "VMEM kernel, ~1.1x on the HBM kernel at 256 "
                        "streams; pre-multiplied residual weights — same "
                        "math, floating-point-reassociated)")
    p.add_argument("--bf16-rings", action="store_true",
                   help="store the HBM generation ring buffers in bfloat16 "
                        "(halves DMA traffic / VMEM staging; needs "
                        "residual_channels %% 16 == 0)")
    p.add_argument("--head-tiles", type=int, default=None,
                   help="HBM kernel: run the embed/head/sampling block in G "
                        "stream groups (shrinks its VMEM intermediates by G "
                        "— the lever for wide-head configs at very high "
                        "stream counts; needs streams %% (128*G) == 0)")
    p.add_argument("--draft-snapshot", default=None,
                   help="speculative decoding: a smaller WaveNet snapshot "
                        "drafts k samples and the main model verifies them "
                        "in one window pass (exact argmax rollout; forces "
                        "temperature 0, single stream)")
    p.add_argument("--speculate-k", type=int, default=8,
                   help="speculation depth per verify pass")
    p.add_argument("--force-speculate", action="store_true",
                   help="run --draft-snapshot even when the model fits the "
                        "fused VMEM kernel (which measured ~8x faster than "
                        "speculation at achievable draft quality — PERF.md)")
    p.add_argument("--ema", action="store_true",
                   help="generate from the snapshot's EMA weights "
                        "(train.py --ema-decay)")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--regularize", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="latest_generated_clip.wav")
    p.add_argument("--sr", type=int, default=16000)
    return p.parse_args()


def main():
    from pytorch_wavenet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # restarts reload compiled programs from disk
    args = parse_args()
    import pytorch_wavenet_tpu as wt

    if args.torch_snapshot:
        params, cfg = wt.load_reference_snapshot(
            args.torch_snapshot, layers=args.torch_layers,
            blocks=args.torch_blocks,
        )
    elif args.snapshot:
        blob = wt.load_checkpoint(args.snapshot)
        cfg = blob["config"]
        params = blob["params"]
    else:
        blob = wt.load_latest_model_from(args.snapshot_path)
        cfg = blob["config"]
        params = blob["params"]
    if args.ema:
        from pytorch_wavenet_tpu.training.optimizers import (
            find_ema_state_dict,
        )

        ema = (find_ema_state_dict(blob["opt_state"])
               if not args.torch_snapshot and blob.get("opt_state")
               else None)
        if ema is None:
            raise SystemExit("--ema: this snapshot carries no EMA weights "
                             "(train with --ema-decay)")
        params = ema
        print("generating from EMA weights")
    params = jax.tree_util.tree_map(jnp.asarray, params)
    print(f"receptive field: {cfg.receptive_field}")
    print(f"parameter count: {cfg.parameter_count():,}")

    # default prime: one mid-class sample per stream (reference:
    # wavenet_model.py:245-247); overridden from the dataset below
    first_samples = jnp.full((args.num_streams, 1), cfg.classes // 2, jnp.int32)
    if args.data_dir:
        data = wt.WaveNetDataset(
            dataset_file=os.path.join(args.data_dir, "dataset.npz"),
            item_length=cfg.item_length,
            target_length=cfg.output_length,
            file_location=args.data_dir,
            classes=cfg.classes,
            test_stride=20,
        )
        x, _ = data[min(args.prime_index, len(data) - 1)]
        prime = np.asarray(x[-cfg.receptive_field :], np.int32)
        first_samples = jnp.asarray(
            np.tile(prime[None, :], (args.num_streams, 1))
        )

    # vocoder modes: conditioning mel frames from a file or copy-synthesis
    mel = None
    if args.vocode_wav:
        from pytorch_wavenet_tpu.data.audio_io import load_audio
        from pytorch_wavenet_tpu.ops.mel import log_mel_spectrogram

        wav_in, sr = load_audio(args.vocode_wav, sampling_rate=args.sr)
        mel = log_mel_spectrogram(
            wav_in, num_mels=cfg.cond_channels, n_fft=args.n_fft,
            hop_length=args.hop_length, sampling_rate=sr,
        )
        print(f"copy-synthesis: {len(wav_in)} samples -> {mel.shape[0]} mel frames")
    elif args.mel_file:
        mel = np.load(args.mel_file).astype(np.float32)
        print(f"mel frames: {mel.shape}")
    if mel is not None and cfg.cond_channels == 0:
        raise SystemExit("vocoder mode needs a conditioned model "
                         "(cfg.cond_channels > 0)")
    if mel is not None and mel.ndim == 2 and args.num_streams > 1:
        mel = np.tile(mel[None], (args.num_streams, 1, 1))

    import time

    if args.draft_snapshot:
        if mel is not None:
            raise SystemExit("--draft-snapshot does not combine with "
                             "vocoder modes yet")
        if args.num_streams != 1:
            raise SystemExit("speculative decoding is single-stream")
        from pytorch_wavenet_tpu.models.speculative import (
            speculative_generate,
        )

        # Measured tradeoff (PERF.md "Speculative decoding"): whenever the
        # teacher fits the fused VMEM kernel, that serial path is ~8x faster
        # than speculation at achievable draft quality — speculation only
        # pays for models too large for VMEM weight residency. Refuse the
        # silently-slower path unless the user insists.
        if not args.force_speculate and jax.devices()[0].platform == "tpu":
            from pytorch_wavenet_tpu.ops.pallas.gen_kernel import (
                _VMEM_BUDGET_BYTES,
                fused_vmem_bytes,
            )

            need = fused_vmem_bytes(
                cfg, args.num_streams, args.num_samples + cfg.receptive_field
            )
            if need <= _VMEM_BUDGET_BYTES:
                raise SystemExit(
                    "--draft-snapshot: this model fits the fused VMEM kernel, "
                    "which measured ~8x faster than speculative decoding at "
                    "achievable draft quality (docs/PERF.md). Drop "
                    "--draft-snapshot to take the fast path, or pass "
                    "--force-speculate to run speculation anyway."
                )

        dblob = wt.load_checkpoint(args.draft_snapshot) \
            if os.path.isfile(args.draft_snapshot) \
            else wt.load_latest_model_from(args.draft_snapshot)
        dcfg, dparams = dblob["config"], jax.tree_util.tree_map(
            jnp.asarray, dblob["params"]
        )
        print(f"speculative decoding: draft {dcfg.parameter_count():,} "
              f"params, k={args.speculate_k} (exact argmax rollout)")
        t0 = time.perf_counter()
        wav, _, rate = speculative_generate(
            params, cfg, dparams, dcfg, jax.random.PRNGKey(args.seed),
            args.num_samples, first_samples, k=args.speculate_k,
        )
        wav = np.asarray(wav)
        dt = time.perf_counter() - t0
        print(f"{wav.size} samples in {dt:.2f}s ({wav.size/dt:.0f} "
              f"samples/s), accept rate {float(rate):.2f}/{args.speculate_k}"
              f" per verify pass")
        wt.write_wav(args.out, wav[0], args.sr)
        print(f"wrote {args.out}")
        return

    # fastest available path: fused Pallas kernels on TPU, XLA scan otherwise
    gen = wt.generate_fast
    path = "XLA scan"
    reason = None

    def _hbm_backend():
        from pytorch_wavenet_tpu.ops.pallas.gen_kernel_hbm import (
            generate_fast_batched,
        )

        g, p = generate_fast_batched, "fused HBM kernel"
        if args.bf16_rings:
            g = partial(g, ring_dtype=jnp.bfloat16)
            p += " (bf16 rings)"
        if not args.exact_chain:
            # +11% at 256 streams, a wash at 1024+ where the extra
            # (2D, D) chain matmul cancels the latency saving (PERF.md)
            g = partial(g, fuse_res=True)
            p += " (fuse_res)"
        # all-L tap/activation staging crowds VMEM at high stream counts:
        # the 8-layer rotating window measured 1.61x at 2048 bf16 streams
        # (saber), 1.36x at 512 f32 streams (chaconne), unlocked 4096, and
        # was neutral at smaller working sets (PERF.md)
        nsp = -(-args.num_streams // 128) * 128
        if cfg.num_layers > 8 and (
            nsp >= 2048 or (nsp >= 512 and not args.bf16_rings)
        ):
            g = partial(g, stage_layers=8)
            p += " (staged)"
        if args.head_tiles:
            g = partial(g, head_tiles=args.head_tiles)
            p += f" (head/{args.head_tiles})"
        return g, p

    if jax.devices()[0].platform != "tpu":
        reason = "not on TPU"
    elif args.num_streams % 128 == 0 and args.num_streams > 0:
        gen, path = _hbm_backend()
    else:
        from pytorch_wavenet_tpu.ops.pallas.gen_kernel import (
            _VMEM_BUDGET_BYTES,
            fused_vmem_bytes,
            generate_fast_fused,
        )

        need = fused_vmem_bytes(
            cfg, args.num_streams, args.num_samples + cfg.receptive_field
        )
        if need <= _VMEM_BUDGET_BYTES:
            gen = generate_fast_fused
            path = "fused VMEM kernel"
            if not args.exact_chain:
                gen = partial(generate_fast_fused, fuse_res=True)
                path += " (fuse_res)"
        else:
            # too big for on-chip queue state: the HBM kernel auto-pads
            # the lane dimension to 128 (dummy lanes are nearly free)
            gen, path = _hbm_backend()
            pad = -(-args.num_streams // 128) * 128
            reason = f"auto-padding {args.num_streams} -> {pad} streams"
    print(f"generation path: {path}" + (f" ({reason})" if reason else ""))

    t0 = time.perf_counter()
    if mel is not None:
        wav, _ = wt.synthesize(
            params, cfg, jax.random.PRNGKey(args.seed), jnp.asarray(mel),
            args.hop_length, first_samples, temperature=args.temperature,
            regularize=args.regularize, backend=gen,
        )
    else:
        wav, _ = gen(
            params, cfg, jax.random.PRNGKey(args.seed), args.num_samples,
            first_samples, temperature=args.temperature,
            regularize=args.regularize,
        )
    wav = np.asarray(wav)
    dt = time.perf_counter() - t0
    total = wav.shape[0] * wav.shape[1]
    print(f"{total} samples in {dt:.2f}s ({total/dt:.0f} samples/s)")

    if args.num_streams == 1:
        wt.write_wav(args.out, wav[0], args.sr)
        print(f"wrote {args.out}")
    else:
        stem, ext = os.path.splitext(args.out)
        for i in range(args.num_streams):
            wt.write_wav(f"{stem}_{i}{ext}", wav[i], args.sr)
        print(f"wrote {args.num_streams} files {stem}_*{ext}")


if __name__ == "__main__":
    main()
