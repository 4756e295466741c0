#!/usr/bin/env python
"""Streaming synthesis server: WaveNet generation over HTTP.

The reference stops at batch scripts; this is the serving half the
streaming-state API (models/generate.py StreamState, ops/pallas
FusedGenState) was built for: audio is generated in fixed-size chunks
whose ring-buffer state flows between device calls, and each chunk's
PCM is flushed to the client as soon as it exists — time-to-first-audio
is one chunk, not one clip, and a canceled request stops the rollout at
the next chunk boundary.

Endpoints
  GET  /health          -> JSON {status, params, receptive_field, backend}
  GET  /stats           -> JSON pool metrics (batcher mode: lane occupancy,
       queue depth, lifetime admitted/completed/cancelled/failed counters,
       samples_out, pool_steps — see ContinuousBatcher.stats)
  GET  /synthesize      -> audio/wav, streamed while it generates
       query params: num_samples (default 16000), temperature (1.0),
                     seed (0), chunk (2048)
  POST /synthesize      -> same, parameters as a JSON body; additionally
       "prime" (mu-law class ids) or "prime_audio" (float samples in
       [-1, 1], quantized server-side) continues from caller history
       instead of the mid-class cold start. Primes are truncated to the
       last receptive_field samples (bitwise-exact — older history cannot
       influence the rollout); each distinct prime length compiles a
       specialized program once, so callers should prefer a consistent
       prime length (e.g. always >= receptive_field)
  POST /profile         -> capture a jax.profiler trace of the live server
       (requires --profile-dir); query: seconds (default 3)
  POST /reload          -> rolling weight update: swap in a snapshot's
       weights (newest under --snapshot-path, or body {"snapshot": path,
       "ema": bool}) without dropping streams; same config required
  POST /vocode          -> audio/wav copy-synthesis: body is a wav upload,
       the server featurizes it to log-mels and re-synthesizes through the
       conditioned model (requires cfg.cond_channels > 0); query params:
       temperature, seed, hop_length (256), n_fft (1024)

One device, one rollout at a time: concurrent requests serialize on a
lock (the chunk loop yields it between chunks, so interleaved requests
make progress instead of starving). With ``--batcher`` they instead share
one persistent multi-stream rollout (serving/batcher.py): each request
claims a lane of the HBM kernel's lane pool at the next chunk boundary,
carries its own sampling temperature, and streams out as the pool
produces samples — no head-of-line blocking. Cancellation holds in both
modes: a hung-up client's request is dropped at the next chunk boundary
(in batcher mode its lane frees for the next request).

Example:
  python scripts/serve.py --snapshot snaps/model_0000001000.ckpt --port 8765
  curl -sN 'localhost:8765/synthesize?num_samples=16000&temperature=0.9' > x.wav
"""

import os

if os.environ.get("WAVENET_TPU_FORCE_CPU"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import argparse
import json
import struct
import sys
import threading
import time
from functools import partial
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--snapshot-path", default="snapshots")
    p.add_argument("--snapshot", default=None, help="explicit checkpoint file")
    p.add_argument("--torch-snapshot", default=None,
                   help="serve a reference pytorch-wavenet snapshot "
                        "directly (whole-module pickle or state dict; see "
                        "generate.py --torch-snapshot)")
    p.add_argument("--torch-layers", type=int, default=None)
    p.add_argument("--torch-blocks", type=int, default=None)
    p.add_argument("--ema", action="store_true",
                   help="serve the snapshot's EMA weights "
                        "(train.py --ema-decay)")
    p.add_argument("--student-snapshot", default=None,
                   help="serve a distilled IAF student (scripts/distill.py "
                        "checkpoint): whole clips synthesize in ONE dense "
                        "parallel pass instead of an autoregressive loop; "
                        "a conditioned student also serves /vocode "
                        "(Parallel-WaveNet vocoding). temperature and "
                        "prime are not supported on this backend (the "
                        "student samples from its own logistic noise; "
                        "per-request seed still applies)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--backend", choices=("auto", "xla", "vmem"),
                   default="auto",
                   help="auto = fused VMEM kernel on TPU when the state "
                        "fits, XLA scan otherwise")
    p.add_argument("--batcher", action="store_true",
                   help="continuous batching: all /synthesize requests "
                        "share one persistent multi-stream rollout (the "
                        "HBM kernel's lane pool) — requests join and leave "
                        "at chunk boundaries instead of queuing behind "
                        "each other")
    p.add_argument("--lanes", type=int, default=128,
                   help="batcher lane-pool width (multiple of 128 on TPU)")
    p.add_argument("--batch-chunk", type=int, default=1024,
                   help="batcher splice granularity in samples (also the "
                        "streaming time-to-first-audio)")
    p.add_argument("--light-chunk", type=int, default=None,
                   help="batcher adaptive chunking: dispatch this many "
                        "steps per chunk while the pool is lightly loaded "
                        "(cuts TTFA to ~light-chunk steps; responses stay "
                        "bitwise chunk-invariant)")
    p.add_argument("--mesh-data", type=int, default=0,
                   help="shard the batcher lane pool over this many chips "
                        "(a data-axis mesh; --lanes is the POOL total, a "
                        "multiple of 128 per chip). Per-request seeds make "
                        "responses identical to single-chip serving.")
    p.add_argument("--bf16-rings", action="store_true",
                   help="batcher: store ring state in bfloat16 (halves DMA "
                        "traffic / VMEM staging — the lever for 1024+ "
                        "lanes; see PERF.md)")
    p.add_argument("--head-tiles", type=int, default=None,
                   help="batcher: run the kernel's embed/head/sampling "
                        "block in G stream groups (VMEM lever for "
                        "wide-head configs at high lane counts)")
    p.add_argument("--cond-hop", type=int, default=256,
                   help="batcher pools on conditioned models: the mel hop "
                        "the pool expands frames at (requests' hop_length "
                        "must match; frames-on-the-wire conditioning)")
    p.add_argument("--cond-wire", choices=("f32", "bf16"), default="f32",
                   help="mel-frame upload dtype (bf16 halves the cond "
                        "wire; responses equal the solo rollout of "
                        "bf16-rounded frames)")
    p.add_argument("--batcher-interpret", action="store_true",
                   help=argparse.SUPPRESS)  # CPU tests of the batcher path
    p.add_argument("--max-pending", type=int, default=None,
                   help="batcher admission control: requests beyond this "
                        "queue depth get HTTP 503 instead of buffering "
                        "unboundedly")
    p.add_argument("--reload-interval", type=float, default=0,
                   help="follow a live training run: poll --snapshot-path "
                        "every N seconds and roll newer snapshots into the "
                        "running server (streams keep flowing)")
    p.add_argument("--reload-ema", action="store_true",
                   help="with --reload-interval: roll in the snapshots' "
                        "EMA weights")
    p.add_argument("--profile-dir", default=None,
                   help="enable POST /profile: capture a jax.profiler "
                        "trace of the live server into this directory "
                        "(view with tensorboard/xprof). Body/query: "
                        "seconds (default 3, max 60)")
    p.add_argument("--max-samples", type=int, default=16000 * 60,
                   help="per-request ceiling")
    p.add_argument("--sr", type=int, default=16000)
    return p.parse_args()


def wav_header(num_samples: int, sr: int) -> bytes:
    """44-byte RIFF/WAVE header for 16-bit mono PCM of a known length —
    written up front so clients can play the stream as it arrives."""
    data_bytes = num_samples * 2
    return (
        b"RIFF" + struct.pack("<I", 36 + data_bytes) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
        + b"data" + struct.pack("<I", data_bytes)
    )


# student clip lengths round up to this (jit shapes are static; arbitrary
# client lengths would each compile a fresh whole-clip program)
_STUDENT_BUCKET = 8192


def _param_count(synth) -> int:
    cfg = synth.cfg
    if hasattr(cfg, "parameter_count"):
        return cfg.parameter_count()
    from pytorch_wavenet_tpu.models.iaf import student_parameter_count

    return student_parameter_count(synth.params)


class Synthesizer:
    """Owns the model and the device; serializes rollouts chunk-by-chunk —
    or, with a :class:`ContinuousBatcher`, splices concurrent requests into
    one persistent multi-stream rollout."""

    def __init__(self, params, cfg, backend: str, sr: int,
                 batcher_opts: dict | None = None, student: bool = False):
        self.cfg = cfg
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.sr = sr
        self.lock = threading.Lock()
        self.batcher = None
        if student:
            # distilled IAF student: clips synthesize in one dense
            # parallel pass (models/iaf.py student_generate)
            self.backend = "iaf-student"
        elif batcher_opts is not None:
            from pytorch_wavenet_tpu.serving import ContinuousBatcher

            self.batcher = ContinuousBatcher(
                self.params, cfg, **batcher_opts)
            t0 = time.time()
            self.batcher.prewarm()
            print(f"batcher prewarm (admission programs for every "
                  f"burst width): {time.time() - t0:.1f} s", flush=True)
            self.backend = "hbm-batcher"
        else:
            self.backend = self._pick_backend(backend)

    def _pick_backend(self, backend: str) -> str:
        if backend == "auto":
            if jax.devices()[0].platform != "tpu":
                return "xla"
            from pytorch_wavenet_tpu.ops.pallas.gen_kernel import (
                _VMEM_BUDGET_BYTES,
                fused_vmem_bytes,
            )

            need = fused_vmem_bytes(
                self.cfg, 1, self.cfg.receptive_field + 8192
            )
            return "vmem" if need <= _VMEM_BUDGET_BYTES else "xla"
        return backend

    def _gen_fn(self):
        import pytorch_wavenet_tpu as wt

        if self.backend == "vmem":
            from pytorch_wavenet_tpu.ops.pallas.gen_kernel import (
                generate_fast_fused,
            )

            return partial(generate_fast_fused, fuse_res=True)
        return wt.generate_fast

    def _stream_batched(self, num_samples: int, temperature: float,
                        seed: int, prime=None):
        """Bridge the batcher's chunk callbacks into a generator: the
        request joins the shared rollout at the next chunk boundary and
        wav chunks flow out as the pool produces them. The request's seed
        drives its own lane's noise counters, so the response is
        reproducible regardless of pool load. If the consumer abandons
        the stream (client hang-up), the request is cancelled so its lane
        frees at the next chunk boundary."""
        import queue as _q

        from pytorch_wavenet_tpu.ops.mulaw import dequantize_to_f32

        chunks: _q.Queue = _q.Queue()
        if prime is None:
            prime = np.asarray([self.cfg.classes // 2], np.int32)
        handle = self.batcher.submit(
            np.asarray(prime, np.int32), num_samples,
            temperature=temperature, on_chunk=chunks.put, seed=seed,
        )
        got = 0
        try:
            while got < num_samples:
                try:
                    cls = chunks.get(timeout=1.0)
                except _q.Empty:
                    if not handle.done():
                        continue
                    # _deliver and _finish are adjacent on the batcher
                    # thread: the final chunk(s) can land between our
                    # timeout and the done() check — drain before breaking
                    try:
                        cls = chunks.get_nowait()
                    except _q.Empty:
                        handle.result(timeout=0)  # re-raise a batcher error
                        break
                cls = cls[: num_samples - got]
                got += cls.size
                yield dequantize_to_f32(cls, self.cfg.classes)
        finally:
            handle.cancel()  # no-op if complete; frees the lane otherwise

    def vocode(self, wav_bytes: bytes, hop_length: int, n_fft: int,
               temperature: float, seed: int) -> np.ndarray:
        """Copy-synthesis: wav bytes -> log-mel frames -> conditioned
        rollout (models.generate.synthesize). Returns float32 (T,)."""
        import tempfile

        import pytorch_wavenet_tpu as wt
        from pytorch_wavenet_tpu.data.audio_io import load_audio
        from pytorch_wavenet_tpu.ops.mel import log_mel_spectrogram

        with tempfile.NamedTemporaryFile(suffix=".wav") as f:
            f.write(wav_bytes)
            f.flush()
            wav_in, sr = load_audio(f.name, sampling_rate=self.sr)
        mel = log_mel_spectrogram(
            wav_in, num_mels=self.cfg.cond_channels, n_fft=n_fft,
            hop_length=hop_length, sampling_rate=sr,
        )
        if self.backend == "iaf-student":
            # Parallel-WaveNet vocoding: the whole clip in one dense pass
            # (length bucketed — see stream(); cond rows clamp-extend)
            from pytorch_wavenet_tpu.models.iaf import student_synthesize

            n = mel.shape[0] * hop_length
            nb = -(-n // _STUDENT_BUCKET) * _STUDENT_BUCKET
            with self.lock:
                return np.asarray(student_synthesize(
                    self.params, self.cfg, jax.random.PRNGKey(seed),
                    jnp.asarray(mel)[None], hop_length,
                    num_samples=nb)[0][:n])
        if self.batcher is not None:
            # per-lane conditioning: the request rides the shared rollout;
            # the pool expands mel FRAMES to sample rate on device
            n = mel.shape[0] * hop_length  # num_given=1 -> F*hop samples
            if self.batcher.cond_hop != hop_length:
                raise ValueError(
                    f"this pool expands conditioning at hop "
                    f"{self.batcher.cond_hop}; request used hop_length="
                    f"{hop_length}")
            h = self.batcher.submit(
                np.asarray([self.cfg.classes // 2], np.int32), n,
                temperature=temperature, cond_frames=np.asarray(mel),
                seed=seed,
            )
            wav, _ = h.result(timeout=3600)
            return wav
        first = jnp.full((1, 1), self.cfg.classes // 2, jnp.int32)
        with self.lock:
            wav, _ = wt.synthesize(
                self.params, self.cfg, jax.random.PRNGKey(seed),
                jnp.asarray(mel), hop_length, first,
                temperature=temperature, backend=self._gen_fn(),
            )
            return np.asarray(wav[0])

    def reload(self, snapshot: str | None, snapshot_path: str,
               ema: bool = False) -> int:
        """Rolling weight update into the live pool/synthesizer (see
        POST /reload); returns the snapshot's step."""
        import pytorch_wavenet_tpu as wt

        if self.backend == "iaf-student":
            raise ValueError("reload serves WaveNet snapshots")
        if snapshot is not None and not isinstance(snapshot, str):
            # e.g. a JSON integer would reach open() as an OS fd
            raise ValueError("snapshot must be a path string")
        blob = (wt.load_checkpoint(snapshot) if snapshot
                else wt.load_latest_model_from(snapshot_path))
        params = blob["params"]
        if ema:
            from pytorch_wavenet_tpu.training.optimizers import (
                find_ema_state_dict,
            )

            params = find_ema_state_dict(blob.get("opt_state"))
            if params is None:
                raise ValueError("snapshot carries no EMA weights")
        if blob["config"] is not None and blob["config"] != self.cfg:
            raise ValueError("snapshot config differs from the serving "
                             "config")
        params = jax.tree_util.tree_map(jnp.asarray, params)
        if self.batcher is not None:
            self.batcher.update_params(params)
        else:
            with self.lock:
                self.params = params
        return blob.get("step")

    def stream(self, num_samples: int, temperature: float, seed: int,
               chunk: int, prime=None):
        """Yield float32 (chunk,) waveform arrays; ring state carries
        across chunks (bitwise-equal to a single shot at temperature 0).
        ``prime`` (flat int class ids) seeds the rollout with caller
        history instead of the mid-class cold start."""
        if self.backend == "iaf-student":
            from pytorch_wavenet_tpu.models.iaf import student_generate

            # round the clip length up to a bucket: num_samples is a
            # static shape of the jitted dense pass, so arbitrary client
            # lengths would each compile (and cache) a fresh program
            nb = -(-num_samples // _STUDENT_BUCKET) * _STUDENT_BUCKET
            with self.lock:  # one dense pass for the whole clip
                wav = np.asarray(student_generate(
                    self.params, self.cfg, jax.random.PRNGKey(seed),
                    nb)[0][:num_samples])
            for i in range(0, num_samples, chunk):
                yield wav[i : i + chunk]
            return
        if self.batcher is not None:
            yield from self._stream_batched(num_samples, temperature, seed,
                                            prime)
            return
        gen = self._gen_fn()
        cfg = self.cfg
        key = jax.random.PRNGKey(seed)
        first = (jnp.full((1, 1), cfg.classes // 2, jnp.int32)
                 if prime is None else jnp.asarray(prime, jnp.int32)[None])
        # the vmem backend was budgeted at startup for rf + 8192 samples
        # per dispatch (_pick_backend); a larger client chunk must split
        # (ring state carries across calls, so this is bitwise-invisible)
        max_n = 8192 if self.backend == "vmem" else num_samples
        state = None
        done = 0
        while done < num_samples:
            n = min(chunk, num_samples - done, max_n)
            key, sub = jax.random.split(key)
            with self.lock:
                wav, _, state = gen(
                    self.params, cfg, sub, n,
                    first if done == 0 else None,
                    temperature=temperature, state=state, return_state=True,
                )
                out = np.asarray(wav[0])
            done += n
            yield out


def make_handler(synth: Synthesizer, max_samples: int,
                 profile_dir: str | None = None,
                 snapshot_path: str = "snapshots"):
    profile_lock = threading.Lock()
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            sys.stderr.write("%s - %s\n" % (self.address_string(),
                                            fmt % args))

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _params_from(self, query: dict, body: dict) -> dict:
            def pick(name, cast, default):
                if name in body:
                    return cast(body[name])
                if name in query:
                    return cast(query[name][0])
                return default

            req = {
                "num_samples": pick("num_samples", int, 16000),
                "temperature": pick("temperature", float, 1.0),
                "seed": pick("seed", int, 0),
                "chunk": pick("chunk", int, 2048),
                "prime": None,
            }
            # continuation: the rollout is primed on caller-provided
            # history instead of the mid-class cold start (the reference's
            # dataset-primed generation, generate_script.py:19-32) —
            # "prime" is mu-law class ids, "prime_audio" raw float samples
            # in [-1, 1] (quantized server-side)
            if (synth.backend == "iaf-student"
                    and (body.get("prime") is not None
                         or body.get("prime_audio") is not None)):
                raise ValueError("the IAF student has no autoregressive "
                                 "history to prime")
            if body.get("prime") is not None:
                req["prime"] = np.asarray(body["prime"], np.int64)
                if (req["prime"].ndim != 1
                        or (req["prime"] < 0).any()
                        or (req["prime"] >= synth.cfg.classes).any()):
                    raise ValueError(
                        f"prime must be a flat list of class ids in "
                        f"[0, {synth.cfg.classes})")
            elif body.get("prime_audio") is not None:
                from pytorch_wavenet_tpu.ops.mulaw import quantize_data

                audio = np.asarray(body["prime_audio"], np.float64)
                if audio.ndim != 1:
                    raise ValueError("prime_audio must be a flat list "
                                     "of samples in [-1, 1]")
                req["prime"] = quantize_data(
                    np.clip(audio, -1.0, 1.0), synth.cfg.classes)
            if req["prime"] is not None:
                # only the last receptive_field samples can influence the
                # rollout (the ring holds exactly that much history), so
                # truncating is bitwise-exact — and it bounds both the
                # kernel's prime buffers and the number of distinct
                # compile shapes a client can force
                rf = synth.cfg.receptive_field
                req["prime"] = req["prime"][-rf:].astype(np.int32)
            return req

        def _synthesize(self, body: dict):
            q = parse_qs(urlparse(self.path).query)
            try:
                req = self._params_from(q, body)
            except (ValueError, TypeError) as e:
                return self._json(400, {"error": f"bad parameter: {e}"})
            if not 0 < req["num_samples"] <= max_samples:
                return self._json(
                    400, {"error": f"num_samples must be in "
                                   f"(0, {max_samples}]"})
            if req["chunk"] < 1:
                return self._json(400, {"error": "chunk must be >= 1"})
            if req["prime"] is not None and not (
                    1 <= req["prime"].size <= max_samples):
                return self._json(
                    400, {"error": f"prime length must be in "
                                   f"[1, {max_samples}]"})

            # pull the first chunk BEFORE committing a 200: admission
            # errors (e.g. a full pool under --max-pending) still map to
            # an HTTP status instead of a truncated audio stream
            from pytorch_wavenet_tpu.serving import PoolOverloaded

            gen = synth.stream(req["num_samples"], req["temperature"],
                               req["seed"], req["chunk"], req["prime"])
            try:
                first = next(gen)
            except PoolOverloaded as e:
                return self._json(503, {"error": str(e)})

            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header(
                "Content-Length", str(44 + req["num_samples"] * 2))
            self.end_headers()
            self.wfile.write(wav_header(req["num_samples"], synth.sr))
            try:
                pcm = np.clip(first * 32767.0, -32768, 32767)
                self.wfile.write(pcm.astype("<i2").tobytes())
                self.wfile.flush()
                for wav in gen:
                    pcm = np.clip(wav * 32767.0, -32768, 32767)
                    self.wfile.write(pcm.astype("<i2").tobytes())
                    self.wfile.flush()
            except BrokenPipeError:
                gen.close()  # client hung up; cancel at the next boundary

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/health":
                return self._json(200, {
                    "status": "ok",
                    "backend": synth.backend,
                    "receptive_field": synth.cfg.receptive_field,
                    "parameter_count": _param_count(synth),
                    "classes": getattr(synth.cfg, "classes", None),
                    "sample_rate": synth.sr,
                })
            if path == "/stats":
                out = {"backend": synth.backend}
                if synth.batcher is not None:
                    out.update(synth.batcher.stats())
                return self._json(200, out)
            if path == "/synthesize":
                return self._synthesize({})
            self._json(404, {"error": f"no route {path}"})

        def _reload(self):
            """Rolling weight update: load a snapshot (newest under the
            server's --snapshot-path by default, or body {"snapshot":
            path, "ema": bool}) and swap the weights into the live
            pool/synthesizer without dropping streams. Same-config
            snapshots only — the compiled programs key on shapes."""
            length = int(self.headers.get("Content-Length", 0) or 0)
            body = {}
            if length:
                try:
                    body = json.loads(self.rfile.read(length) or b"{}")
                except json.JSONDecodeError:
                    return self._json(400, {"error": "body is not JSON"})
            try:
                step = synth.reload(body.get("snapshot"), snapshot_path,
                                    ema=bool(body.get("ema")))
            except (OSError, ValueError, KeyError) as e:
                return self._json(400, {"error": str(e)})
            return self._json(200, {"reloaded": True, "step": step})

        def _profile(self):
            """Capture a jax.profiler trace of whatever the server is
            doing right now (device steps, transfers, host callbacks) —
            the production 'why is this pool slow' tool. One capture at a
            time; requests keep serving while it runs."""
            if profile_dir is None:
                return self._json(
                    400, {"error": "start the server with --profile-dir"})
            q = parse_qs(urlparse(self.path).query)
            try:
                seconds = float(q.get("seconds", ["3"])[0])
            except ValueError:
                return self._json(400, {"error": "bad seconds"})
            seconds = min(max(seconds, 0.1), 60.0)
            if not profile_lock.acquire(blocking=False):
                return self._json(409, {"error": "a capture is running"})
            try:
                import time as _t

                try:
                    jax.profiler.start_trace(profile_dir)
                    _t.sleep(seconds)
                finally:
                    # stop_trace raising (no trace started, disk full)
                    # must never hold the lock — that would 409 every
                    # future capture
                    jax.profiler.stop_trace()
            except Exception as e:
                return self._json(500, {"error": str(e)})
            finally:
                profile_lock.release()
            return self._json(200, {"trace_dir": profile_dir,
                                    "seconds": seconds})

        def _vocode(self):
            if synth.cfg.cond_channels == 0:
                return self._json(
                    400, {"error": "this model is unconditional "
                                   "(cfg.cond_channels == 0)"})
            length = int(self.headers.get("Content-Length", 0) or 0)
            if not 44 <= length <= 64 * 1024 * 1024:
                return self._json(
                    400, {"error": "body must be a wav upload (<= 64 MB)"})
            blob = self.rfile.read(length)
            q = parse_qs(urlparse(self.path).query)

            def qp(name, cast, default):
                return cast(q[name][0]) if name in q else default

            from pytorch_wavenet_tpu.serving import PoolOverloaded

            try:
                wav = synth.vocode(
                    blob,
                    hop_length=qp("hop_length", int, 256),
                    n_fft=qp("n_fft", int, 1024),
                    temperature=qp("temperature", float, 1.0),
                    seed=qp("seed", int, 0),
                )
            except PoolOverloaded as e:
                return self._json(503, {"error": str(e)})
            except (ValueError, TypeError) as e:
                return self._json(400, {"error": str(e)})
            pcm = np.clip(wav * 32767.0, -32768, 32767).astype("<i2")
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(44 + pcm.size * 2))
            self.end_headers()
            self.wfile.write(wav_header(pcm.size, synth.sr))
            self.wfile.write(pcm.tobytes())

        def do_POST(self):
            path = urlparse(self.path).path
            if path == "/vocode":
                return self._vocode()
            if path == "/profile":
                return self._profile()
            if path == "/reload":
                return self._reload()
            if path != "/synthesize":
                return self._json(404, {"error": f"no route {path}"})
            length = int(self.headers.get("Content-Length", 0) or 0)
            body = {}
            if length:
                try:
                    body = json.loads(self.rfile.read(length) or b"{}")
                except json.JSONDecodeError:
                    return self._json(400, {"error": "body is not JSON"})
            self._synthesize(body)

    return Handler


def main():
    from pytorch_wavenet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # restarts reload compiled programs from disk
    args = parse_args()
    import pytorch_wavenet_tpu as wt

    if args.student_snapshot:
        from pytorch_wavenet_tpu.models.iaf import load_student_snapshot

        params, scfg, step = load_student_snapshot(args.student_snapshot)
        print(f"student resumed at step {step}")
        blob = {"params": params, "config": scfg}
    elif args.torch_snapshot:
        params, cfg = wt.load_reference_snapshot(
            args.torch_snapshot, layers=args.torch_layers,
            blocks=args.torch_blocks)
        blob = {"params": params, "config": cfg}
    elif args.snapshot:
        blob = wt.load_checkpoint(args.snapshot)
    else:
        blob = wt.load_latest_model_from(args.snapshot_path)
    if args.ema:
        from pytorch_wavenet_tpu.training.optimizers import (
            find_ema_state_dict,
        )

        if args.torch_snapshot or args.student_snapshot:
            raise SystemExit("--ema applies to framework WaveNet "
                             "snapshots")
        ema = find_ema_state_dict(blob.get("opt_state"))
        if ema is None:
            raise SystemExit("--ema: this snapshot carries no EMA weights "
                             "(train with --ema-decay)")
        blob = {"params": ema, "config": blob["config"]}
        print("serving EMA weights")
    batcher_opts = None
    if args.batcher and args.student_snapshot:
        raise SystemExit("--batcher is the AR lane pool; the student "
                         "already synthesizes whole clips in one pass")
    if args.reload_interval > 0 and args.student_snapshot:
        raise SystemExit("--reload-interval follows WaveNet snapshot "
                         "directories; the student backend cannot reload")
    if args.batcher:
        batcher_opts = dict(lanes=args.lanes, chunk=args.batch_chunk,
                            interpret=args.batcher_interpret,
                            head_tiles=args.head_tiles,
                            light_chunk=args.light_chunk,
                            max_pending=args.max_pending)
        if blob["config"].cond_channels:
            # conditioned pools ship mel FRAMES over the wire and expand
            # on device (hop x less per-chunk upload; the pool's hop is a
            # server property — /vocode requests must use it)
            batcher_opts["cond_hop"] = args.cond_hop
            if args.cond_wire == "bf16":
                batcher_opts["cond_wire_dtype"] = jnp.bfloat16
        if args.bf16_rings:
            batcher_opts["ring_dtype"] = jnp.bfloat16
        if not args.batcher_interpret:
            batcher_opts["fuse_res"] = True
            # wide-skip configs: defer the skip projection into one
            # K=L*D slab dot per head group — 1.6-1.9x at chaconne
            # widths (PERF.md); for narrow skips the per-layer dot is
            # already a single MXU pass and the slab only adds staging
            if blob["config"].skip_channels >= 256:
                batcher_opts["skip_slab"] = True
            # all-L tap/activation staging crowds VMEM at high per-chip
            # lane counts; the 8-layer rotating window measured 1.61x at
            # 2048 bf16 streams / 1.36x at 512 f32 (PERF.md), neutral below
            per_chip = args.lanes // max(args.mesh_data, 1)
            cfg_ = blob["config"]
            if cfg_.num_layers > 8 and (
                per_chip >= 2048
                or (per_chip >= 512 and not args.bf16_rings)
            ):
                batcher_opts["stage_layers"] = 8
        if args.mesh_data:
            from pytorch_wavenet_tpu.parallel.mesh import make_mesh

            batcher_opts["mesh"] = make_mesh(
                args.mesh_data, 1,
                devices=jax.devices()[: args.mesh_data])
    synth = Synthesizer(blob["params"], blob["config"], args.backend,
                        args.sr, batcher_opts=batcher_opts,
                        student=bool(args.student_snapshot))

    # warm the compile cache so the first request doesn't eat it
    next(iter(synth.stream(1, 1.0, 0, 1)))

    if args.reload_interval > 0:
        from pytorch_wavenet_tpu.utils.checkpoints import latest_checkpoint

        def follow():
            import time as _t

            seen = latest_checkpoint(args.snapshot_path)
            while True:
                _t.sleep(args.reload_interval)
                newest = latest_checkpoint(args.snapshot_path)
                if newest and newest != seen:
                    try:
                        step = synth.reload(newest, args.snapshot_path,
                                            ema=args.reload_ema)
                        print(f"rolled in {newest} (step {step})",
                              flush=True)
                        seen = newest
                    except (ValueError, KeyError, OSError) as e:
                        print(f"reload of {newest} failed: {e}",
                              flush=True)

        threading.Thread(target=follow, daemon=True,
                         name="snapshot-follower").start()

    server = ThreadingHTTPServer(
        (args.host, args.port),
        make_handler(synth, args.max_samples, args.profile_dir,
                     args.snapshot_path))
    print(f"serving {_param_count(synth):,}-param model on "
          f"http://{args.host}:{server.server_address[1]} "
          f"(backend: {synth.backend})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        if synth.batcher is not None:  # finish in-flight clips, then stop
            synth.batcher.close(drain=True)


if __name__ == "__main__":
    main()
