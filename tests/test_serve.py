"""Streaming synthesis server (scripts/serve.py): end-to-end over HTTP.

The server is the serving counterpart of the streaming-state API — chunked
generation with ring state carried between device calls — so the key
assertion is that the bytes that arrive over the wire equal a direct
single-shot ``generate_fast`` rollout (temperature 0 is bitwise)."""

import json
import os
import socket
import struct
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ENV = {
    **os.environ,
    "JAX_PLATFORMS": "",
    "WAVENET_TPU_FORCE_CPU": "1",
}


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    import pytorch_wavenet_tpu as wt

    cfg = wt.get_config("tiny")
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    d = tmp_path_factory.mktemp("serve")
    wt.save_checkpoint(str(d), "tiny", 0, params, cfg=cfg)
    ckpt = os.path.join(str(d), os.listdir(d)[0])

    with socket.socket() as s:  # free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    prof = str(tmp_path_factory.mktemp("prof"))
    proc = subprocess.Popen(
        [sys.executable, "scripts/serve.py", "--snapshot", ckpt,
         "--port", str(port), "--backend", "xla", "--max-samples", "4000",
         "--profile-dir", prof],
        cwd=REPO, env=ENV,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 120
        while True:
            try:
                with urllib.request.urlopen(base + "/health", timeout=5) as r:
                    health = json.loads(r.read())
                break
            except OSError:
                if proc.poll() is not None or time.time() > deadline:
                    out = proc.stdout.read() if proc.stdout else ""
                    raise RuntimeError(f"server died:\n{out[-2000:]}")
                time.sleep(0.5)
        yield base, health, (params, cfg)
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_health(server):
    _, health, (params, cfg) = server
    assert health["status"] == "ok"
    assert health["backend"] == "xla"
    assert health["receptive_field"] == cfg.receptive_field
    assert health["parameter_count"] == cfg.parameter_count()


def _fetch_wav(url):
    with urllib.request.urlopen(url, timeout=300) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        blob = r.read()
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    n = struct.unpack("<I", blob[40:44])[0] // 2
    pcm = np.frombuffer(blob[44:], "<i2")
    assert pcm.size == n
    return pcm


def test_streamed_wav_matches_direct_rollout(server):
    """Chunked-over-HTTP == single-shot on device (temperature 0)."""
    import jax
    import jax.numpy as jnp

    import pytorch_wavenet_tpu as wt

    base, _, (params, cfg) = server
    n = 96
    pcm = _fetch_wav(
        f"{base}/synthesize?num_samples={n}&temperature=0&seed=3&chunk=25")

    first = jnp.full((1, 1), cfg.classes // 2, jnp.int32)
    wav, _ = wt.generate_fast(params, cfg, jax.random.PRNGKey(3), n, first,
                              temperature=0.0)
    expect = np.clip(np.asarray(wav[0]) * 32767.0, -32768, 32767).astype("<i2")
    np.testing.assert_array_equal(pcm, expect)


def test_vocode_rejected_on_unconditional_model(server):
    base, _, _ = server
    req = urllib.request.Request(
        base + "/vocode", data=b"\0" * 100,
        headers={"Content-Type": "audio/wav"}, method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    assert b"unconditional" in e.value.read()


@pytest.fixture(scope="module", params=["direct", "batcher"])
def vocoder_server(request, tmp_path_factory):
    import jax

    import pytorch_wavenet_tpu as wt

    cfg = wt.get_config("tiny_vocoder")
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    d = tmp_path_factory.mktemp("serve_voc")
    wt.save_checkpoint(str(d), "tinyv", 0, params, cfg=cfg)
    ckpt = os.path.join(str(d), os.listdir(d)[0])

    extra = []
    if request.param == "batcher":
        extra = ["--batcher", "--batcher-interpret", "--lanes", "2",
                 "--batch-chunk", "256", "--cond-hop", "64"]
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [sys.executable, "scripts/serve.py", "--snapshot", ckpt,
         "--port", str(port), "--backend", "xla", *extra],
        cwd=REPO, env=ENV,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 120
        while True:
            try:
                with urllib.request.urlopen(base + "/health", timeout=5):
                    break
            except OSError:
                if proc.poll() is not None or time.time() > deadline:
                    out = proc.stdout.read() if proc.stdout else ""
                    raise RuntimeError(f"server died:\n{out[-2000:]}")
                time.sleep(0.5)
        yield base
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_vocode_copy_synthesis(vocoder_server, tmp_path):
    """wav upload -> log-mel featurization -> conditioned rollout -> wav."""
    from pytorch_wavenet_tpu.data.audio_io import write_wav

    t = np.arange(1600) / 16000.0
    path = tmp_path / "in.wav"
    write_wav(str(path), 0.3 * np.sin(2 * np.pi * 220 * t), 16000)
    blob = path.read_bytes()

    req = urllib.request.Request(
        f"{vocoder_server}/vocode?hop_length=64&n_fft=256&temperature=0.8",
        data=blob, headers={"Content-Type": "audio/wav"}, method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        out = r.read()
    assert out[:4] == b"RIFF" and out[8:12] == b"WAVE"
    n = struct.unpack("<I", out[40:44])[0] // 2
    assert n > 1000  # ~ F * hop samples of synthesized audio
    assert len(out) == 44 + n * 2


@pytest.fixture(scope="module")
def batcher_server(tmp_path_factory):
    """serve.py --batcher (interpret-mode lane pool, CPU)."""
    import jax

    import pytorch_wavenet_tpu as wt

    cfg = wt.get_config("tiny")
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    d = tmp_path_factory.mktemp("serve_batch")
    wt.save_checkpoint(str(d), "tiny", 0, params, cfg=cfg)
    ckpt = os.path.join(str(d), os.listdir(d)[0])

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [sys.executable, "scripts/serve.py", "--snapshot", ckpt,
         "--port", str(port), "--batcher", "--batcher-interpret",
         "--lanes", "3", "--batch-chunk", "5"],
        cwd=REPO, env=ENV,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 180
        while True:
            try:
                with urllib.request.urlopen(base + "/health", timeout=5) as r:
                    health = json.loads(r.read())
                break
            except OSError:
                if proc.poll() is not None or time.time() > deadline:
                    out = proc.stdout.read() if proc.stdout else ""
                    raise RuntimeError(f"server died:\n{out[-2000:]}")
                time.sleep(0.5)
        yield base, health, (params, cfg)
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_batcher_concurrent_requests(batcher_server):
    """Two concurrent requests share the lane pool; the temperature-0 one
    equals the direct rollout bitwise even with a hot neighbor."""
    import concurrent.futures

    import jax
    import jax.numpy as jnp

    import pytorch_wavenet_tpu as wt

    base, health, (params, cfg) = batcher_server
    assert health["backend"] == "hbm-batcher"

    def fetch(temp):
        return _fetch_wav(
            f"{base}/synthesize?num_samples=12&temperature={temp}")

    with concurrent.futures.ThreadPoolExecutor(2) as ex:
        cold = ex.submit(fetch, 0)
        hot = ex.submit(fetch, 1.0)
        pcm_cold, pcm_hot = cold.result(300), hot.result(300)

    first = jnp.full((1, 1), cfg.classes // 2, jnp.int32)
    wav, _ = wt.generate_fast(params, cfg, jax.random.PRNGKey(0), 12, first,
                              temperature=0.0)
    expect = np.clip(np.asarray(wav[0]) * 32767.0, -32768, 32767).astype("<i2")
    np.testing.assert_array_equal(pcm_cold, expect)
    assert pcm_hot.size == 12


def test_batcher_stats_endpoint(batcher_server):
    """/stats exposes the pool's lifetime counters."""
    base, _, _ = batcher_server
    _fetch_wav(f"{base}/synthesize?num_samples=3&temperature=0")
    with urllib.request.urlopen(base + "/stats", timeout=30) as r:
        s = json.loads(r.read())
    assert s["backend"] == "hbm-batcher"
    assert s["lanes"] >= 2 and s["admitted"] >= 1
    assert s["samples_out"] >= s["completed"]
    assert s["pool_steps"] >= 1


def test_post_json_and_limits(server):
    base, _, _ = server
    req = urllib.request.Request(
        base + "/synthesize",
        data=json.dumps({"num_samples": 40, "temperature": 0.8,
                         "seed": 1, "chunk": 16}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        blob = r.read()
    assert len(blob) == 44 + 40 * 2

    # over the per-request ceiling -> 400, JSON error
    bad = urllib.request.Request(
        base + "/synthesize?num_samples=100000")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(bad, timeout=30)
    assert e.value.code == 400


def test_primed_synthesis(server, batcher_server):
    """POST "prime" continues from caller history: the temperature-0
    response equals a direct rollout primed on the same classes — on both
    the direct and the continuous-batching server."""
    import jax
    import jax.numpy as jnp

    import pytorch_wavenet_tpu as wt

    for base, _, (params, cfg) in (server, batcher_server):
        rf = cfg.receptive_field
        prime = np.asarray(jax.random.randint(
            jax.random.PRNGKey(50), (rf,), 0, cfg.classes))
        req = urllib.request.Request(
            base + "/synthesize",
            data=json.dumps({"num_samples": 14, "temperature": 0,
                             "prime": prime.tolist()}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            blob = r.read()
        pcm = np.frombuffer(blob[44:], "<i2")
        wav, _ = wt.generate_fast(
            params, cfg, jax.random.PRNGKey(0), 14,
            jnp.asarray(prime)[None], temperature=0.0)
        expect = np.clip(np.asarray(wav[0]) * 32767.0, -32768,
                         32767).astype("<i2")
        np.testing.assert_array_equal(pcm, expect)

    # prime_audio floats quantize server-side; bad class ids -> 400
    base, _, (params, cfg) = server
    req = urllib.request.Request(
        base + "/synthesize",
        data=json.dumps({"num_samples": 6, "temperature": 0,
                         "prime_audio": [0.0, 0.25, -0.5]}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        assert len(r.read()) == 44 + 6 * 2
    bad = urllib.request.Request(
        base + "/synthesize",
        data=json.dumps({"num_samples": 6,
                         "prime": [cfg.classes + 5]}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(bad, timeout=30)
    assert e.value.code == 400


def test_serve_reference_torch_snapshot(tmp_path_factory):
    """--torch-snapshot: a reference whole-module pickle serves directly
    (the migration path: reference checkpoint -> TPU serving)."""
    import jax

    import pytorch_wavenet_tpu as wt
    from test_convert import _random_state_dict, _save_reference_like_module

    cfg = wt.WaveNetConfig(layers=3, blocks=2, dilation_channels=8,
                           residual_channels=8, skip_channels=16,
                           end_channels=16, classes=32)
    sd = _random_state_dict(cfg, seed=7)
    d = tmp_path_factory.mktemp("serve_ref")
    snap = os.path.join(str(d), "ref_module.pt")
    _save_reference_like_module(cfg, sd, snap)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [sys.executable, "scripts/serve.py", "--torch-snapshot", snap,
         "--port", str(port), "--backend", "xla", "--max-samples", "4000"],
        cwd=REPO, env=ENV,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 120
        while True:
            try:
                with urllib.request.urlopen(base + "/health", timeout=5) as r:
                    health = json.loads(r.read())
                break
            except OSError:
                if proc.poll() is not None or time.time() > deadline:
                    out = proc.stdout.read() if proc.stdout else ""
                    raise RuntimeError(f"server died:\n{out[-2000:]}")
                time.sleep(0.5)
        assert health["receptive_field"] == cfg.receptive_field
        assert health["parameter_count"] == cfg.parameter_count()
        pcm = _fetch_wav(f"{base}/synthesize?num_samples=30&temperature=0")
        assert pcm.size == 30
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_serve_iaf_student(tmp_path_factory):
    """--student-snapshot: the distilled student serves whole clips in one
    dense pass; per-request seeds are reproducible, primes rejected."""
    import dataclasses

    import jax

    from pytorch_wavenet_tpu.models.iaf import IAFConfig, init_student
    from pytorch_wavenet_tpu.utils.checkpoints import save_checkpoint

    scfg = IAFConfig(flows=2, layers=2, blocks=1, residual_channels=8,
                     dilation_channels=8, skip_channels=8, end_channels=8)
    params = init_student(jax.random.PRNGKey(0), scfg)
    d = str(tmp_path_factory.mktemp("serve_student"))
    snap = save_checkpoint(d, "student", 5, params,
                           extra={"iaf_config": dataclasses.asdict(
                               dataclasses.replace(scfg,
                                                   compute_dtype=None))})

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [sys.executable, "scripts/serve.py", "--student-snapshot", snap,
         "--port", str(port), "--max-samples", "64000"],
        cwd=REPO, env=ENV,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 120
        while True:
            try:
                with urllib.request.urlopen(base + "/health", timeout=5) as r:
                    health = json.loads(r.read())
                break
            except OSError:
                if proc.poll() is not None or time.time() > deadline:
                    out = proc.stdout.read() if proc.stdout else ""
                    raise RuntimeError(f"server died:\n{out[-2000:]}")
                time.sleep(0.5)
        assert health["backend"] == "iaf-student"
        a = _fetch_wav(f"{base}/synthesize?num_samples=4000&seed=3")
        b = _fetch_wav(f"{base}/synthesize?num_samples=4000&seed=3")
        c = _fetch_wav(f"{base}/synthesize?num_samples=4000&seed=4")
        np.testing.assert_array_equal(a, b)
        assert (a != c).any()

        req = urllib.request.Request(
            base + "/synthesize",
            data=json.dumps({"num_samples": 8, "prime": [1, 2]}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_profile_endpoint(server):
    """POST /profile captures a jax.profiler trace of the live server."""
    base, _, _ = server
    req = urllib.request.Request(base + "/profile?seconds=0.5",
                                 data=b"", method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        out = json.loads(r.read())
    files = []
    for root, _, names in os.walk(out["trace_dir"]):
        files += [os.path.join(root, n) for n in names]
    assert any("xplane" in f or "trace.json" in f for f in files), files


def test_student_vocoder_server(tmp_path_factory, tmp_path):
    """A conditioned student serves /vocode: wav -> log-mel -> the whole
    clip re-synthesized in one dense parallel pass."""
    import dataclasses

    import jax

    from pytorch_wavenet_tpu.data.audio_io import write_wav
    from pytorch_wavenet_tpu.models.iaf import IAFConfig, init_student
    from pytorch_wavenet_tpu.utils.checkpoints import save_checkpoint

    scfg = IAFConfig(flows=2, layers=2, blocks=1, residual_channels=8,
                     dilation_channels=8, skip_channels=8, end_channels=8,
                     cond_channels=6)
    params = init_student(jax.random.PRNGKey(0), scfg)
    d = str(tmp_path_factory.mktemp("serve_student_voc"))
    snap = save_checkpoint(d, "student", 1, params,
                           extra={"iaf_config": dataclasses.asdict(
                               dataclasses.replace(scfg,
                                                   compute_dtype=None))})

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [sys.executable, "scripts/serve.py", "--student-snapshot", snap,
         "--port", str(port)],
        cwd=REPO, env=ENV,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 120
        while True:
            try:
                with urllib.request.urlopen(base + "/health", timeout=5):
                    break
            except OSError:
                if proc.poll() is not None or time.time() > deadline:
                    out = proc.stdout.read() if proc.stdout else ""
                    raise RuntimeError(f"server died:\n{out[-2000:]}")
                time.sleep(0.5)
        t = np.arange(1600) / 16000.0
        path = tmp_path / "in.wav"
        write_wav(str(path), 0.3 * np.sin(2 * np.pi * 220 * t), 16000)
        req = urllib.request.Request(
            f"{base}/vocode?hop_length=64&n_fft=256",
            data=path.read_bytes(),
            headers={"Content-Type": "audio/wav"}, method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            out = r.read()
        assert out[:4] == b"RIFF"
        n = struct.unpack("<I", out[40:44])[0] // 2
        assert n > 1000 and len(out) == 44 + n * 2
    finally:
        proc.terminate()
        proc.wait(timeout=10)
