"""CLI entry-point smoke tests (subprocess, CPU, tiny config) — the
reference's de-facto integration level (its entry scripts ARE its
integration tests, SURVEY.md §4)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENV = {
    **os.environ,
    "JAX_PLATFORMS": "",  # let the subprocess conftest-equivalent pick CPU
    "WAVENET_TPU_FORCE_CPU": "1",
}


def run(args, timeout=240):
    return subprocess.run(
        [sys.executable, *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=ENV,
        timeout=timeout,
    )


@pytest.fixture(scope="module")
def audio_dir(tmp_path_factory):
    sys.path.insert(0, REPO)
    from pytorch_wavenet_tpu.data.audio_io import write_wav

    d = tmp_path_factory.mktemp("cli_audio")
    t = np.arange(16000) / 16000.0
    write_wav(str(d / "a.wav"), 0.4 * np.sin(2 * np.pi * 200 * t), 16000)
    return d


def test_train_and_generate_cli(audio_dir, tmp_path):
    snaps = str(tmp_path / "snaps")
    r = run([
        "scripts/train.py", "--data-dir", str(audio_dir), "--config", "tiny",
        "--batch-size", "4", "--epochs", "1", "--max-steps", "6",
        "--snapshot-path", snaps, "--snapshot-interval", "5",
        "--log-interval", "3", "--validation-interval", "100000",
        "--generate-interval", "100000", "--test-stride", "50",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loss at step 3" in r.stdout
    assert any(f.endswith(".ckpt") for f in os.listdir(snaps))

    out = str(tmp_path / "clip.wav")
    r = run([
        "scripts/generate.py", "--snapshot-path", snaps,
        "--num-samples", "32", "--temperature", "1.0", "--out", out,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)


def test_vocoder_cli_flow(audio_dir, tmp_path):
    """Train the tiny conditioned preset with the learnable upsampler from
    the CLI, then copy-synthesize a wav through the vocoder path."""
    snaps = str(tmp_path / "snaps")
    r = run([
        "scripts/train.py", "--data-dir", str(audio_dir), "--config",
        "tiny_vocoder", "--batch-size", "4", "--epochs", "1",
        "--max-steps", "4", "--snapshot-path", snaps,
        "--snapshot-interval", "3", "--hop-length", "64", "--n-fft", "256",
        "--cond-upsample", "8,8", "--log-interval", "2",
        "--validation-interval", "100000", "--generate-interval", "100000",
        "--test-stride", "50",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert any(f.endswith(".ckpt") for f in os.listdir(snaps))

    sys.path.insert(0, REPO)
    from pytorch_wavenet_tpu.data.audio_io import write_wav

    short = str(tmp_path / "short.wav")
    t = np.arange(1500) / 16000.0
    write_wav(short, 0.4 * np.sin(2 * np.pi * 300 * t), 16000)
    out = str(tmp_path / "vocoded.wav")
    r = run([
        "scripts/generate.py", "--snapshot-path", snaps,
        "--vocode-wav", short, "--hop-length", "64", "--n-fft", "256",
        "--temperature", "0.5", "--out", out,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "copy-synthesis" in r.stdout
    assert os.path.exists(out)
    import wave

    with wave.open(out) as w:
        # 1500 samples -> 24 mel frames at hop 64 -> 24*64 output samples
        assert w.getnframes() == (1 + 1500 // 64) * 64


def test_bench_cli_emits_json():
    r = run(["bench.py"], timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    blob = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(blob)
    assert blob["value"] > 0


def test_make_demo_data_cli(tmp_path):
    out = str(tmp_path / "demo")
    r = run([
        "scripts/make_demo_data.py", "--out", out, "--minutes", "0.05",
        "--files", "2",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    import wave

    files = sorted(os.listdir(out))
    assert files == ["demo_0.wav", "demo_1.wav"]
    frames = 0
    for f in files:
        with wave.open(os.path.join(out, f)) as w:
            assert w.getframerate() == 16000
            frames += w.getnframes()
    assert frames == int(0.05 * 60 * 16000)
    # deterministic: same seed -> same bytes
    out2 = str(tmp_path / "demo2")
    run(["scripts/make_demo_data.py", "--out", out2, "--minutes", "0.05",
         "--files", "2"])
    with open(os.path.join(out, "demo_0.wav"), "rb") as a, \
         open(os.path.join(out2, "demo_0.wav"), "rb") as b:
        assert a.read() == b.read()


def test_train_cli_bf16(audio_dir, tmp_path):
    snaps = str(tmp_path / "snaps16")
    r = run([
        "scripts/train.py", "--data-dir", str(audio_dir), "--config", "tiny",
        "--bf16", "--batch-size", "2", "--epochs", "1", "--max-steps", "3",
        "--snapshot-path", snaps, "--snapshot-interval", "2",
        "--log-interval", "1", "--validation-interval", "100000",
        "--generate-interval", "100000", "--test-stride", "50",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "bfloat16" in r.stdout  # cfg repr shows the dtype override
    assert "loss at step 1" in r.stdout


def test_distill_cli_flow(tmp_path):
    """Teacher snapshot -> distill a tiny student -> resume + generate
    (scripts/distill.py; the Parallel-WaveNet capability's CLI surface)."""
    sys.path.insert(0, REPO)
    import jax

    import pytorch_wavenet_tpu as wt
    from pytorch_wavenet_tpu.utils.checkpoints import save_checkpoint

    tcfg = wt.get_config("tiny")
    teacher = wt.init_wavenet(jax.random.PRNGKey(0), tcfg)
    snaps = str(tmp_path / "teacher")
    save_checkpoint(snaps, "tiny", 1, teacher, cfg=tcfg)

    students = str(tmp_path / "students")
    wav = str(tmp_path / "student.wav")
    r = run([
        "scripts/distill.py", "--teacher-snapshot", snaps,
        "--flows", "1", "--layers", "2", "--blocks", "1", "--width", "8",
        "--steps", "3", "--batch-size", "2", "--length", "48",
        "--save-interval", "3", "--log-interval", "1",
        "--out-dir", students,
        "--generate", "64", "--wav-out", wav,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "step 3: loss" in r.stdout
    assert os.path.exists(wav)
    ckpts = [f for f in os.listdir(students) if f.endswith(".ckpt")]
    assert ckpts

    # resume from the student checkpoint, generation-only
    r = run([
        "scripts/distill.py", "--teacher-snapshot", snaps,
        "--student-snapshot", os.path.join(students, ckpts[0]),
        "--flows", "1", "--layers", "2", "--width", "8",
        "--steps", "0", "--generate", "32",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "student resumed at step 3" in r.stdout
    assert "one parallel pass" in r.stdout


def test_serving_bench_cli_smoke():
    """Closed-loop batcher load generator: completes, and the JSON line
    carries sane throughput/latency fields."""
    r = run([
        "scripts/serving_bench.py", "--interpret", "--config", "tiny",
        "--lanes", "3", "--chunk", "32", "--concurrency", "2",
        "--requests", "4", "--num-samples", "64", "--json",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    blob = json.loads(r.stdout.strip().splitlines()[-1])
    assert blob["requests"] == 4 and blob["agg_samples_per_s"] > 0
    assert blob["completed"] == 4 and blob["failed"] == 0
    assert 0 < blob["ttfa_p50_ms"] <= blob["ttfa_p95_ms"]
    assert blob["latency_p50_s"] <= blob["latency_p95_s"]
    # wire-byte counters feed the transport-normalized capacity metric
    assert blob["bytes_down"] > 0 and blob["wire_bytes_per_sample"] > 0


def test_serving_bench_cli_snapshot(tmp_path):
    """--snapshot loads a saved checkpoint (regression: the loader dict
    key is 'config', not 'cfg' — a KeyError here once broke every
    snapshot-driven bench)."""
    sys.path.insert(0, REPO)
    import jax

    import pytorch_wavenet_tpu as wt
    from pytorch_wavenet_tpu.utils.checkpoints import save_checkpoint

    cfg = wt.get_config("tiny")
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    path = save_checkpoint(str(tmp_path), "tiny", 1, params, cfg=cfg)
    r = run([
        "scripts/serving_bench.py", "--interpret", "--snapshot", path,
        "--lanes", "2", "--chunk", "32", "--concurrency", "1",
        "--requests", "2", "--num-samples", "48", "--json",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    blob = json.loads(r.stdout.strip().splitlines()[-1])
    assert blob["completed"] == 2 and blob["failed"] == 0


def test_train_cli_schedule_and_accum(audio_dir, tmp_path):
    """LR schedule (warmup + cosine) and gradient accumulation train,
    snapshot, and resume through the CLI."""
    snaps = str(tmp_path / "snaps_sched")
    common = [
        "scripts/train.py", "--data-dir", str(audio_dir), "--config", "tiny",
        "--batch-size", "2", "--epochs", "1",
        "--lr-schedule", "cosine", "--warmup-steps", "2",
        "--decay-steps", "20", "--min-lr-ratio", "0.1",
        "--accum-steps", "2",
        "--snapshot-path", snaps, "--snapshot-interval", "4",
        "--log-interval", "1", "--validation-interval", "100000",
        "--generate-interval", "100000", "--test-stride", "50",
    ]
    r = run([*common, "--max-steps", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loss at step 1" in r.stdout
    # resume restores the MultiSteps/schedule optimizer state
    r = run([*common, "--max-steps", "6", "--resume"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "resuming at step 4" in r.stdout


def test_train_ema_and_generate(audio_dir, tmp_path):
    """--ema-decay tracks averaged weights in the optimizer state;
    generate.py --ema rolls out from them (and refuses EMA-less snaps)."""
    snaps = str(tmp_path / "snaps_ema")
    r = run([
        "scripts/train.py", "--data-dir", str(audio_dir), "--config", "tiny",
        "--batch-size", "2", "--epochs", "1", "--max-steps", "3",
        "--ema-decay", "0.5",
        "--snapshot-path", snaps, "--snapshot-interval", "3",
        "--log-interval", "1", "--validation-interval", "100000",
        "--generate-interval", "100000", "--test-stride", "50",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    out = str(tmp_path / "ema.wav")
    r = run([
        "scripts/generate.py", "--snapshot-path", snaps, "--ema",
        "--num-samples", "16", "--temperature", "0", "--out", out,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "generating from EMA weights" in r.stdout
    assert os.path.exists(out)

    # EMA weights differ from the live weights after 3 steps
    sys.path.insert(0, REPO)
    import pytorch_wavenet_tpu as wt
    from pytorch_wavenet_tpu.training.optimizers import find_ema_state_dict

    blob = wt.load_latest_model_from(snaps)
    ema = find_ema_state_dict(blob["opt_state"])
    assert ema is not None
    live = blob["params"]["start"]["w"]
    assert (np.asarray(ema["start"]["w"]) != np.asarray(live)).any()

    # a snapshot trained without EMA is refused
    snaps2 = str(tmp_path / "snaps_no_ema")
    run(["scripts/train.py", "--data-dir", str(audio_dir), "--config",
         "tiny", "--batch-size", "2", "--epochs", "1", "--max-steps", "1",
         "--snapshot-path", snaps2, "--snapshot-interval", "1",
         "--log-interval", "1", "--validation-interval", "100000",
         "--generate-interval", "100000", "--test-stride", "50"])
    r = run(["scripts/generate.py", "--snapshot-path", snaps2, "--ema",
             "--num-samples", "8", "--out", str(tmp_path / "x.wav")])
    assert r.returncode != 0
    assert "no EMA weights" in r.stderr + r.stdout


def test_conditioned_distill_cli(audio_dir, tmp_path):
    """Vocoder distillation: a conditioned teacher distills into a
    conditioned student on real mel timelines; the teacher is scored
    under the same conditioning it was trained with."""
    sys.path.insert(0, REPO)
    import jax

    import pytorch_wavenet_tpu as wt
    from pytorch_wavenet_tpu.utils.checkpoints import save_checkpoint

    tcfg = wt.get_config("tiny_vocoder")
    teacher = wt.init_wavenet(jax.random.PRNGKey(0), tcfg)
    snaps = str(tmp_path / "voc_teacher")
    save_checkpoint(snaps, "tinyv", 1, teacher, cfg=tcfg)

    students = str(tmp_path / "students")
    wav = str(tmp_path / "voc_student.wav")
    r = run([
        "scripts/distill.py", "--teacher-snapshot", snaps,
        "--data-dir", str(audio_dir),
        "--flows", "1", "--layers", "2", "--width", "8",
        "--steps", "2", "--batch-size", "2", "--length", "200",
        "--hop-length", "64", "--n-fft", "256",
        "--save-interval", "2", "--log-interval", "1",
        "--out-dir", students, "--generate", "100", "--wav-out", wav,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "step 2: loss" in r.stdout
    assert os.path.exists(wav)

    # a conditioned teacher without data refuses up front
    r = run(["scripts/distill.py", "--teacher-snapshot", snaps,
             "--flows", "1", "--layers", "2", "--width", "8",
             "--steps", "1"])
    assert r.returncode != 0
    assert "mel timelines" in r.stderr + r.stdout


def test_scaling_bench_cli_smoke():
    """The scaling harness runs end-to-end on a virtual CPU mesh and
    prints an efficiency line per mesh size (the measurement path
    BASELINE.md's pod targets rely on)."""
    r = subprocess.run(
        [sys.executable, "scripts/scaling_bench.py", "--config", "tiny",
         "--per-device-batch", "2", "--steps", "2"],
        capture_output=True, text=True, cwd=REPO, timeout=600,
        env={**ENV, "XLA_FLAGS": "--xla_force_host_platform_device_count=4"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "devices=4" in r.stdout
    assert "mesh data=4" in r.stdout and "% of linear" in r.stdout


def test_distill_demo_cli_smoke(tmp_path):
    """The end-to-end distillation demo (teacher -> IAF student ->
    metrics -> artifacts) at --smoke scale, including the --out-dir
    artifact write."""
    out = str(tmp_path / "demo")
    r = run([
        "scripts/distill_demo.py", "--mode", "vocoder", "--smoke",
        "--teacher-steps", "4", "--distill-steps", "4", "--json",
        "--out-dir", out,
    ], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    blob = json.loads(r.stdout.strip().splitlines()[-1])
    assert blob["mode"] == "vocoder" and "rms_ratio" in blob
    assert os.path.exists(os.path.join(out, "student_vocoder.wav"))
    assert os.path.exists(os.path.join(out, "metrics_vocoder.json"))


def test_serving_soak_cli_smoke():
    """Randomized endurance soak completes and its lifecycle invariants
    hold (hangs, lane leaks, and counter incoherence raise)."""
    r = run([
        "scripts/serving_soak.py", "--interpret", "--config", "tiny",
        "--lanes", "3", "--chunk", "32", "--seconds", "3",
        "--max-samples", "96", "--workers", "3", "--json",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    blob = json.loads(r.stdout.strip().splitlines()[-1])
    assert blob["hung"] == 0 and blob["mismatched"] == 0
    assert blob["pool_outstanding"] == 0 and blob["pool_free"] == 3
