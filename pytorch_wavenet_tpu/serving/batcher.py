"""Continuous batching for autoregressive generation.

Production serving rarely sees requests arrive together: a batch-per-call
API either waits to fill a batch (latency) or runs small batches
(throughput). This module keeps ONE persistent multi-stream rollout alive
on the device — a lane pool over :func:`ops.pallas.gen_kernel_hbm.
generate_fast_batched`'s streaming state — and splices requests in and out
at chunk boundaries:

* every lane of the shared :class:`HbmGenState` is a slot; free lanes run
  greedy on stale state (lanes are nearly free — every op in the kernel is
  lane-pointwise, see the kernel's docstring);
* a new request is primed by a solo kernel call, its ring column is
  zero-filled where the solo run never wrote (the reference's zero-filled
  queues, wavenet_modules.py:74-77), **roll-aligned** from its local clock
  to the batcher's global clock (ring slot = t mod period, so re-basing t
  is a per-layer roll of the slot axis), and scattered into the shared
  ring;
* each request carries its own sampling temperature (the kernel's
  per-stream temperature lanes), so mixed-temperature traffic shares one
  rollout;
* each request carries its own sampling seed, counted off its OWN step
  clock (the kernel's lane_seed/lane_clock rows), so even hot rollouts
  are reproducible;
* outputs are distributed per chunk, so callers can stream audio while
  later requests keep joining.

Admission is exact at every temperature: a request's rollout is bitwise
identical to a solo rollout of the same (prime, seed, temperature), no
matter when it is admitted or what shares the pool — pinned in
tests/test_batcher.py.

The reference has no serving analogue (its generation is a blocking
batch-1 script, wavenet_model.py:237); this is the TPU-native replacement
the framework's streaming-state API was built to enable.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WaveNetConfig
from ..models.wavenet import Params
from ..ops.mulaw import dequantize_to_f32
from ..ops.pallas.gen_kernel_hbm import HbmGenState, generate_fast_batched


class RequestCancelled(RuntimeError):
    """Raised by :meth:`GenerationHandle.result` after ``cancel()``."""


class PoolOverloaded(RuntimeError):
    """Raised by :meth:`ContinuousBatcher.submit` when the waiting queue
    is at ``max_pending`` — shed load instead of buffering unboundedly
    (the server maps this to HTTP 503)."""


class GenerationHandle:
    """Caller-side view of a submitted request."""

    def __init__(self, num_samples: int, on_chunk=None):
        self.num_samples = num_samples
        self._on_chunk = on_chunk
        self._parts: list[np.ndarray] = []
        self._done = threading.Event()
        self._cancel = threading.Event()
        self._error: BaseException | None = None
        self._on_done = None  # batcher bookkeeping hook, fired exactly once
        # per-request lifecycle timestamps/durations, filled by the batcher
        # (t_submit/t_admitted/t_first perf_counter marks; prime_s/splice_s
        # this request's admission-group device dispatch costs; group its
        # burst size) — serving_bench decomposes TTFA tails from these
        self.timing: dict = {}

    def _deliver(self, cls_chunk: np.ndarray):
        self._parts.append(cls_chunk)
        if self._on_chunk is not None:
            self._on_chunk(cls_chunk)

    def _finish(self, error: BaseException | None = None):
        if self._done.is_set():  # idempotent: worker drain + close() drain
            return
        self._error = error
        self._done.set()
        if self._on_done is not None:
            self._on_done()

    def done(self) -> bool:
        return self._done.is_set()

    def cancel(self):
        """Ask the batcher to drop this request at the next chunk boundary,
        freeing its lane. No-op once complete; after it takes effect,
        ``result()`` raises :class:`RequestCancelled`."""
        self._cancel.set()

    def cancelled(self) -> bool:
        return self._cancel.is_set()

    def result(self, timeout: float | None = None):
        """Block until complete; returns ``(waveform (N,) float32,
        classes (N,) int32)``."""
        if not self._done.wait(timeout):
            raise TimeoutError("generation not complete")
        if self._error is not None:
            raise self._error
        cls = np.concatenate(self._parts)[: self.num_samples]
        return dequantize_to_f32(cls, self._classes), cls


@dataclass(eq=False)  # identity semantics: instances ride snapshot lists
class _Active:
    handle: GenerationHandle
    lane: int
    remaining: int
    # rows mode: remaining per-sample cond rows (k, M).
    # frames mode (pool cond_hop set): the request's FULL frame timeline
    # (F, M); cond_off tracks the next sample-rate row to consume.
    cond: np.ndarray | None = None
    cond_off: int = 0


@dataclass
class _Pending:
    handle: GenerationHandle
    prime: np.ndarray
    temperature: float
    cond: np.ndarray | None = None
    seed: int = 0


class ContinuousBatcher:
    """A persistent lane pool over the batched generation kernel.

    ``lanes`` is the compiled stream width (a multiple of 128 on hardware;
    any small number in interpret mode). ``chunk`` is the splice
    granularity: requests join/leave every ``chunk`` samples, which is also
    a streaming consumer's time-to-first-audio.

    All device work happens on one background thread; ``submit`` only
    enqueues. ``close()`` abandons outstanding handles with a
    RuntimeError; ``close(drain=True)`` finishes accepted work first.
    """

    def __init__(self, params: Params, cfg: WaveNetConfig, *, lanes: int = 128,
                 chunk: int = 128, seed: int = 0, interpret: bool = False,
                 ring_dtype=jnp.float32, fuse_res: bool = False,
                 stage_layers: int | None = None,
                 head_tiles: int | None = None,
                 skip_slab: bool = False,
                 regularize: float = 0.0,
                 max_pending: int | None = None,
                 cond_hop: int | None = None,
                 light_chunk: int | None = None,
                 light_threshold: float = 0.25,
                 cond_wire_dtype=jnp.float32,
                 mesh=None):
        """``mesh``: a ``jax.sharding.Mesh`` with a data axis — the lane
        pool is sharded over it and every chunk advances on all chips in
        one :func:`~pytorch_wavenet_tpu.parallel.training.sharded_pool_step`
        (pod-scale serving: n_chips x lanes-per-chip streams, one pool).
        Per-request seeds make this transparent: a lane's rollout is
        bitwise identical however many chips the pool spans."""
        self.cond_hop = cond_hop
        self._factors: tuple[int, ...] = ()
        if cond_hop is not None:
            # frames-on-the-wire conditioning: requests submit mel FRAMES
            # (cond_frames=) and the pool expands them to sample rate ON
            # DEVICE per chunk — hop x less host->device traffic than
            # sample-rate rows (a (lanes, chunk, 80) f32 slab is ~160 MB
            # per chunk at 1024 lanes; frames are ~hop x smaller), with
            # bitwise chunk-invariant expansion (ops/mel.py
            # expand_frames_window) so the pooled rollout still equals the
            # solo one
            if cfg.cond_channels == 0:
                raise ValueError("cond_hop needs cfg.cond_channels > 0")
            if cond_hop < 1:
                raise ValueError(f"cond_hop must be >= 1, got {cond_hop}")
            if cfg.cond_upsample and "cond_up" in params:
                total = 1
                for r in cfg.cond_upsample:
                    total *= r
                if total != cond_hop:
                    raise ValueError(
                        f"cond_upsample factors {cfg.cond_upsample} "
                        f"multiply to {total} != cond_hop {cond_hop}")
                self._factors = tuple(cfg.cond_upsample)
        self._expand_cache: dict[int, object] = {}
        self._expand_sparse_cache: dict[tuple[int, int], object] = {}
        per_chip = lanes
        if mesh is not None:
            from ..parallel.mesh import DATA_AXIS

            n_data = mesh.shape[DATA_AXIS]
            if lanes % n_data:
                raise ValueError(
                    f"lanes={lanes} not divisible by the mesh data axis "
                    f"({n_data} chips)")
            per_chip = lanes // n_data
        if not interpret and per_chip % 128:
            raise ValueError(f"lanes must be a multiple of 128 per chip on "
                             f"hardware (lane-aligned ring DMAs), got "
                             f"{per_chip}")
        if head_tiles and per_chip % (head_tiles * (1 if interpret else 128)):
            raise ValueError(
                f"{per_chip} per-chip lanes not divisible into "
                f"head_tiles={head_tiles} lane-aligned stream groups")
        self.cfg = cfg
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.mesh = mesh
        self.lanes = lanes
        self.chunk = chunk  # pool clock is int32: one pool serves ~2^31
        # samples (~37 h of 16 kHz audio per lane) before needing a restart
        # Adaptive chunking: a lightly loaded pool dispatches short chunks
        # so a new request's first audio is ~light_chunk steps away
        # instead of ~chunk (the structural TTFA floor is the chunk wall —
        # docs/SERVING.md). Per-request outputs are bitwise chunk-
        # invariant (noise counts off request-local steps; frame expansion
        # is window-exact), so the dispatcher may pick any width any time.
        if light_chunk is not None and not (1 <= light_chunk < chunk):
            raise ValueError(
                f"light_chunk={light_chunk} must be in [1, chunk={chunk})")
        self.light_chunk = light_chunk
        self.light_threshold = float(light_threshold)
        # frames-mode conditioning wire dtype: bf16 halves the per-chunk
        # mel upload (which exceeds the uint8 chunk download on vocoder
        # pools). OPT-IN because it changes responses: frames are rounded
        # once at the wire, so a bf16-wire pool equals the solo rollout of
        # bf16-ROUNDED frames bitwise (tested), not of the f32 originals.
        # Expansion upcasts to f32 on device — only the wire narrows.
        self._cond_wire = jnp.dtype(cond_wire_dtype)
        self.max_pending = max_pending
        self._kw = dict(interpret=interpret, ring_dtype=ring_dtype,
                        fuse_res=fuse_res, stage_layers=stage_layers,
                        head_tiles=head_tiles, skip_slab=skip_slab,
                        regularize=float(regularize),
                        pad_streams=None if interpret else 128)
        self._key = jax.random.PRNGKey(seed)
        self._calls = 0
        self._periods = [(cfg.kernel_size - 1) * d + 1 for d in cfg.dilations]
        self._ring_off = np.cumsum([0] + self._periods)
        self._submit_q: "queue.Queue[_Pending]" = queue.Queue()
        self._active: list[_Active] = []
        self._free = list(range(lanes))
        self._temps = np.zeros(lanes, np.float32)
        # per-lane noise counters (reproducible sampling): each lane draws
        # from its request's seed at its request-local clock, so a hot
        # rollout is bitwise identical to the same-seed solo run no matter
        # when it was admitted
        self._seeds = np.zeros(lanes, np.int32)
        self._toffs = np.zeros(lanes, np.int32)
        self._auto_seed = int(seed) & 0xFFFFFFFF
        self._state: HbmGenState | None = None  # created lazily
        # observability counters (worker-thread writes are plain int +=,
        # atomic under the GIL; stats() reads are a consistent-enough
        # snapshot for monitoring)
        self._n = dict(admitted=0, completed=0, cancelled=0, failed=0,
                       samples_out=0, pool_steps=0, prime_calls=0,
                       # wire bytes (host<->device): chunk downloads at the
                       # wire dtype, cond-slab + prime uploads — the
                       # transport term the normalized capacity metric
                       # (serving_bench --device-profile) divides out
                       bytes_down=0, bytes_up=0)
        # cumulative worker-loop phase seconds (where serving wall time
        # goes: device dispatch, chunk materialize+distribute, admission,
        # idle wait; admission sub-phases prefixed t_prime/t_splice —
        # t_prime_dispatch is the prime ENQUEUE only, t_prime_sync the
        # deferred _deliver_firsts materialization, which rides behind an
        # already-dispatched chunk and so overlaps device work) —
        # `stats()` exposes them for capacity debugging. ALL keys are
        # pre-seeded: stats() iterates this dict from other threads, and
        # a lazy first insert mid-iteration would raise.
        self._t = dict(t_dispatch=0.0, t_deliver=0.0, t_admit=0.0,
                       t_idle=0.0, t_prime_dispatch=0.0, t_prime_sync=0.0,
                       t_splice=0.0)
        # accepted-but-unfinished requests (covers the submit-queue, the
        # in-admission window _admit holds them in, and active lanes) —
        # the drain condition; guarded by its own lock because handles
        # finish while close() holds the lifecycle lock
        self._outstanding = 0
        self._count_lock = threading.Lock()
        # host mirror of the pool clock (state.t): bootstrap value +
        # chunk per pool step — serving /stats and admission rebasing
        # without forcing a device sync against the in-flight step
        self._clock = 0
        self._wake = threading.Event()
        self._closing = False
        self._draining = False
        self._staged_params = None  # pending update_params swap
        self._splice = None  # jitted on-device admission splice (lazy)
        # admission groups whose first samples are still a device future:
        # [(firsts device array, [(handle, act, row), ...]), ...]
        self._deferred: list = []
        # device-resident copies of the per-lane step args — they change
        # only at admission/completion/cancel events, so steady-state
        # chunks skip three host->device uploads each (dispatch compares
        # against the host snapshot, ~us for the whole pool)
        self._dev_args = None
        self._host_args = None
        # serializes the _closing check against close()'s final drain, so a
        # submit can never enqueue into a queue nobody will ever read again
        self._lifecycle = threading.Lock()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="wavenet-batcher")
        self._thread.start()

    # ------------------------------------------------------------- client

    def submit(self, prime, num_samples: int, temperature: float = 1.0,
               on_chunk=None, cond=None, cond_frames=None,
               seed: int | None = None) -> GenerationHandle:
        """Queue a request. ``prime`` is an int class sequence
        ``(num_given,)`` (at least 1 sample; use ``classes // 2`` for an
        unprimed stream). ``on_chunk(cls_chunk)`` fires from the batcher
        thread as samples appear.

        ``cond``: per-sample local conditioning rows
        ``(num_given - 1 + num_samples, cond_channels)`` — the vocoder
        contract (row t conditions the step that consumes input sample t).
        Each lane carries its own conditioning timeline, so many mel/TTS
        streams share one rollout; unconditioned requests on a conditioned
        model get zero rows. Only on pools without ``cond_hop``.

        ``cond_frames``: frame-rate conditioning ``(F, M)`` with
        ``F >= ceil(total_rows / cond_hop)`` — only on pools constructed
        with ``cond_hop``. The pool expands frames to sample rate ON
        DEVICE (``ops.mel.expand_frames_window``: linear interpolation, or
        the model's learnable upsampler when ``cfg.cond_upsample`` is
        set), so the wire carries ``hop`` x less data than per-sample
        rows. Expansion is bitwise chunk-invariant, so the reproducibility
        guarantee below holds with the same-frames solo rollout.

        ``seed``: per-request sampling seed. Sampling noise is counted off
        (class, request-local step, seed), so the rollout is bitwise
        REPRODUCIBLE: resubmitting the same (prime, seed, temperature,
        cond) returns the same samples regardless of pool load or
        admission time, and equals a solo ``generate_fast_batched`` call
        with ``lane_seed=[seed]``. Defaults to a distinct per-request seed
        derived from the pool seed (reproducible pool-wide, not
        per-request)."""
        prime = np.atleast_1d(np.asarray(prime, np.int32))
        if prime.ndim != 1 or prime.size < 1:
            raise ValueError("prime must be a 1-D class sequence")
        if num_samples < 1:
            raise ValueError("num_samples must be >= 1")
        if cond is not None and cond_frames is not None:
            raise ValueError("pass cond OR cond_frames, not both")
        if cond is not None:
            if self.cond_hop is not None:
                raise ValueError(
                    "this pool ships conditioning as frames "
                    f"(cond_hop={self.cond_hop}); pass cond_frames=")
            M = self.cfg.cond_channels
            if M == 0:
                raise ValueError("cond given but cfg.cond_channels == 0")
            cond = np.asarray(cond, np.float32)
            want = (prime.size - 1 + num_samples, M)
            if cond.shape != want:
                raise ValueError(f"cond shape {cond.shape} != {want}")
        if cond_frames is not None:
            if self.cond_hop is None:
                raise ValueError(
                    "cond_frames needs a pool constructed with cond_hop=")
            M = self.cfg.cond_channels
            cond_frames = np.asarray(cond_frames, np.float32)
            need = -(-(prime.size - 1 + num_samples) // self.cond_hop)
            if (cond_frames.ndim != 2 or cond_frames.shape[1] != M
                    or cond_frames.shape[0] < need):
                raise ValueError(
                    f"cond_frames shape {cond_frames.shape} must be "
                    f"(F >= {need}, {M})")
            cond = cond_frames  # rides _Pending.cond; mode is pool-level
        h = GenerationHandle(num_samples, on_chunk)
        h._classes = self.cfg.classes
        h.timing["t_submit"] = time.perf_counter()
        with self._lifecycle:
            if self._closing or self._draining:
                raise RuntimeError("batcher is closed")
            if (self.max_pending is not None
                    and self._submit_q.qsize() >= self.max_pending):
                raise PoolOverloaded(
                    f"{self._submit_q.qsize()} requests already waiting "
                    f"(max_pending={self.max_pending})")
            if seed is None:  # distinct per request, derived from pool seed
                self._auto_seed = (
                    self._auto_seed * 2654435761 + 1) & 0xFFFFFFFF
                seed = self._auto_seed
            seed = int(seed) & 0xFFFFFFFF  # wrap into int32 range
            if seed >= 1 << 31:
                seed -= 1 << 32
            with self._count_lock:
                self._outstanding += 1
            h._on_done = self._request_done
            self._submit_q.put(
                _Pending(h, prime, float(temperature), cond, seed))
        self._wake.set()
        return h

    def update_params(self, params):
        """Swap the model weights at the next chunk boundary WITHOUT
        dropping streams — rolling weight updates from a live trainer.
        In-flight requests continue on the new weights from their next
        chunk (their ring history was computed by the old weights; for
        strictly-one-model rollouts, drain first). The tree must match the
        compiled program: same structure, shapes, and dtypes as the
        current params."""
        new = jax.tree_util.tree_map(jnp.asarray, params)
        old_s = jax.tree_util.tree_structure(self.params)
        new_s = jax.tree_util.tree_structure(new)
        if old_s != new_s:
            raise ValueError(f"params tree mismatch: {new_s} != {old_s}")
        for a, b in zip(jax.tree_util.tree_leaves(self.params),
                        jax.tree_util.tree_leaves(new)):
            if a.shape != b.shape or a.dtype != b.dtype:
                raise ValueError(
                    f"leaf mismatch: {b.shape}/{b.dtype} vs expected "
                    f"{a.shape}/{a.dtype} (same config required)")
        with self._count_lock:  # vs the worker's take (lost-update race)
            self._staged_params = new
        self._wake.set()

    def stats(self) -> dict:
        """Point-in-time pool metrics (safe from any thread): static shape
        (``lanes``, ``chunk``), live gauges (``active``, ``free``,
        ``queued``, ``outstanding``, ``pool_clock``), and lifetime
        counters (``admitted``,
        ``completed``, ``cancelled``, ``failed``, ``samples_out``,
        ``pool_steps``, ``prime_calls``). Served by ``scripts/serve.py``'s
        ``/stats`` endpoint."""
        active = len(self._active)
        with self._count_lock:
            outstanding = self._outstanding
        return {
            "lanes": self.lanes, "chunk": self.chunk,
            "light_chunk": self.light_chunk, "active": active,
            "free": self.lanes - active, "queued": self._submit_q.qsize(),
            "outstanding": outstanding,
            "pool_clock": self._global_t(), **self._n,
            **{k: round(v, 3) for k, v in self._t.items()},
        }

    def close(self, drain: bool = False, timeout: float = 60.0):
        """Stop the pool. ``drain=False`` (default) abandons outstanding
        work: every active and queued handle gets a RuntimeError at the
        next chunk boundary. ``drain=True`` refuses new submissions but
        keeps stepping until every already-accepted request completes (or
        ``timeout`` seconds pass, after which the remainder is abandoned
        as in the default path)."""
        if drain:
            with self._lifecycle:
                self._draining = True  # submit() now refuses
            deadline = time.monotonic() + timeout
            while time.monotonic() < deadline:
                # _outstanding covers queued, in-admission (popped but not
                # yet a lane), and active requests — unlike queue/lane
                # gauges it has no window where an accepted request is
                # invisible to the drain
                with self._count_lock:
                    if self._outstanding == 0:
                        break
                time.sleep(0.05)
        with self._lifecycle:
            self._closing = True
        self._wake.set()
        self._thread.join(timeout=60)
        # the flag flips under the lifecycle lock, so every submit either
        # raised or enqueued before this drain; the worker's own final drain
        # plus this one leave no handle unanswered
        with self._lifecycle:
            while not self._submit_q.empty():
                self._submit_q.get().handle._finish(
                    RuntimeError("batcher closed"))

    # ------------------------------------------------------------- device

    def _request_done(self):
        with self._count_lock:
            self._outstanding -= 1

    def _next_key(self):
        self._calls += 1
        return jax.random.fold_in(self._key, self._calls)

    def _global_t(self) -> int:
        # host mirror, not int(state.t): reading the device scalar would
        # block on the in-flight chunk (and race _fail_all nulling state)
        return 0 if self._state is None else self._clock

    def _prime_states(
        self, pends: list[_Pending]
    ) -> tuple[np.ndarray, int, np.ndarray]:
        """Prime a group of equal-length requests in ONE kernel call (on
        hardware a solo prime pads to 128 lanes anyway, so burst arrivals
        are near-free to admit together). Returns (ring columns
        (rows, n), their shared local clock t, first samples (n,) — each
        request's output sample 0)."""
        n = len(pends)
        ng = pends[0].prime.size
        # Widths bucket to powers-of-two x 128 BY HOST-SIDE PADDING (dummy
        # rows repeat request 0 at temperature 0): every distinct array
        # width reaching jit is a fresh XLA compile of the prime program
        # (~seconds each through the device tunnel), and burst sizes are
        # arbitrary — padding HERE (not inside the jitted kernel, which
        # would still key the cache on the raw burst size) bounds the
        # variants at log2(lanes / 128) + 1, exactly what prewarm()
        # compiles at boot.
        b = n
        if self._kw.get("pad_streams"):
            b = self._kw["pad_streams"]
            while b < n:
                b *= 2
        prime_np = np.stack([p.prime for p in pends])
        temps_np = np.array([p.temperature for p in pends], np.float32)
        seeds_np = np.array([p.seed for p in pends], np.int32)
        if b > n:
            prime_np = np.concatenate(
                [prime_np, np.tile(prime_np[:1], (b - n, 1))])
            temps_np = np.concatenate([temps_np, np.zeros(b - n, np.float32)])
            seeds_np = np.concatenate([seeds_np, np.zeros(b - n, np.int32)])
        cond = None
        if any(p.cond is not None for p in pends):
            # the prime consumes cond rows [0, num_given) of each request
            if self.cond_hop is not None:
                # frames mode: slab the frame timelines (at the bucketed
                # width, so the expansion program is bucketed too) and
                # expand the prime's rows on device (off = 0 -> phase = 0)
                from ..ops.mel import frames_window_len

                Fs = frames_window_len(ng, self.cond_hop, self._factors)
                slab = np.zeros((b, Fs, self.cfg.cond_channels), np.float32)
                for i, p in enumerate(pends):
                    if p.cond is not None:
                        idx = np.minimum(np.arange(Fs), p.cond.shape[0] - 1)
                        slab[i] = p.cond[idx]
                self._n["bytes_up"] += slab.size * self._cond_wire.itemsize
                cond = self._expand_frames(
                    slab, jnp.zeros(b, jnp.int32), ng)
            else:
                cond = np.zeros((b, ng, self.cfg.cond_channels), np.float32)
                for i, p in enumerate(pends):
                    if p.cond is not None:
                        cond[i] = p.cond[:ng]
                self._n["bytes_up"] += cond.size * 4
                cond = jnp.asarray(cond)
        # prime calls pad to 128 streams, which can't satisfy head_tiles'
        # streams % (128*G) requirement — and a <=128-wide call doesn't need
        # head tiling anyway, so drop it here (chunk steps keep it)
        kw = {**self._kw, "head_tiles": None}
        self._n["prime_calls"] += 1
        self._n["bytes_up"] += prime_np.size * 4
        t0 = time.perf_counter()
        _, cls, st = generate_fast_batched(
            self.params, self.cfg, self._next_key(), 1,
            jnp.asarray(prime_np), temperature=jnp.asarray(temps_np),
            cond=cond, return_state=True,
            lane_seed=jnp.asarray(seeds_np),
            **kw,
        )
        self._t["t_prime_dispatch"] += time.perf_counter() - t0
        # EVERYTHING stays on device: the splice re-bases and scatters the
        # primed ring there, and the first samples are returned as a device
        # future — materialized by _deliver_firsts AFTER the next chunk is
        # dispatched, so admission never blocks the one-chunk pipeline on
        # the prime kernel (VERDICT r3 #5: the old np.asarray here stalled
        # dispatch by the in-flight chunk + the prime + a tunnel RTT per
        # burst). The local clock is deterministic (ng - 1 ingested + 1
        # generated), so no device sync on st.t either.
        return st.ring, ng, cls[:, 0]

    def prewarm(self, prime_lengths=(1,)):
        """Compile the admission programs (prime kernel + on-device
        splice) for every power-of-two bucket width up front. Each
        distinct width is a fresh XLA/Mosaic compile — measured at
        ~5 s per width through a device tunnel — which otherwise lands
        on whichever requests arrive in the first burst of that size.
        Call once right after construction, BEFORE submitting traffic
        (it mutates free-lane ring state from the caller thread, which
        is only safe while the pool is empty); a persistent compile
        cache makes later process restarts near-free.

        ``prime_lengths``: the request prime lengths to warm (buckets
        are per exact length; 1 = unprimed requests, the common case).
        """
        if self._kw.get("pad_streams") is None:
            return  # interpret mode: no width bucketing, nothing to warm
        self._ensure_state()
        b = self._kw["pad_streams"]
        widths = []
        while b <= self.lanes:
            widths.append(b)
            b *= 2
        fill = self.cfg.classes // 2
        # conditioned pools warm BOTH program variants: all-unconditioned
        # bursts reach a cond=None prime signature
        cond_variants = [None]
        if self.cond_hop is not None:
            cond_variants.append(np.zeros(
                (-(-max(prime_lengths) // self.cond_hop) + 1,
                 self.cfg.cond_channels), np.float32))
        for ng in prime_lengths:
            for w in widths:
                for cond in cond_variants:
                    pends = [
                        _Pending(GenerationHandle(1, None),
                                 np.full(ng, fill, np.int32), 0.0, cond, 0)
                        for _ in range(w)
                    ]
                    primed, t_local, _ = self._prime_states(pends)
                    self._align_and_insert(
                        primed, t_local, list(range(w)),
                        np.full(w, fill, np.int32))
        # compile the pool-step program for every chunk width the
        # dispatcher can pick — without this, the light-load width's
        # first dispatch pays its XLA compile on a live request (the
        # precise tail prewarm exists to prevent). Stepping the empty
        # bootstrap pool is safe: admissions rebase against the advanced
        # clock by design, and free lanes' output is discarded.
        widths = {self.chunk}
        if self.light_chunk is not None:
            widths.add(self.light_chunk)
        cond_now = [None]
        if self.cfg.cond_channels:
            cond_now = [None, True]  # both program variants, like primes
        for nw in sorted(widths):
            for has_cond in cond_now:
                cond = None
                if has_cond and self.cond_hop is not None:
                    from ..ops.mel import frames_window_len

                    Fs = frames_window_len(nw, self.cond_hop,
                                           self._factors)
                    cond = self._expand_frames(
                        np.zeros((self.lanes, Fs,
                                  self.cfg.cond_channels), np.float32),
                        jnp.zeros(self.lanes, jnp.int32), nw)
                    # sparse (active-lanes-only) expansion programs, one
                    # per power-of-two rider bucket — lazily compiling
                    # these on a live lightly-loaded dispatch is the same
                    # tail the download-gather warm kills
                    for wv in self._sparse_buckets():
                        np.asarray(self._expand_frames_sparse(
                            np.zeros((wv, Fs, self.cfg.cond_channels),
                                     np.float32),
                            jnp.zeros(wv, jnp.int32),
                            jnp.zeros(wv, jnp.int32), nw)[0, 0, 0])
                elif has_cond:  # rows-mode conditioned pools
                    cond = jnp.zeros(
                        (self.lanes, nw, self.cfg.cond_channels),
                        jnp.float32)
                cls = self._step_pool(
                    nw, cond, jnp.asarray(self._temps),
                    jnp.asarray(self._seeds), jnp.asarray(self._toffs))
                np.asarray(cls[0, 0])  # force the compile + execution
                # ...and the dispatch path's download ops at this width:
                # the wire-dtype cast and the active-lane gathers (one
                # program per power-of-two rider bucket) otherwise compile
                # on the first lightly-loaded live dispatch
                cls = cls.astype(self._wire_dtype(), copy=False)
                for w in self._sparse_buckets():
                    np.asarray(jnp.take(
                        cls, jnp.zeros((w,), jnp.int32), axis=0)[0, 0])
        # warm-up work must not pollute the serving-phase attribution
        self._n["prime_calls"] = 0
        self._n["pool_steps"] = 0
        for k in self._t:
            self._t[k] = 0.0

    def _expand_frames(self, slab, phase, count: int):
        """Device-expand a per-lane frame slab to ``count`` sample-rate
        cond rows (frames mode). Jitted per row count (two counts in
        steady state: the chunk size and each distinct prime length).
        The slab crosses the wire at ``cond_wire_dtype`` and upcasts to
        f32 on device before expansion."""
        fn = self._expand_cache.get(count)
        if fn is None:
            hop, factors = self.cond_hop, self._factors
            from ..ops.mel import expand_frames_window

            @jax.jit
            def fn(cond_up, slab, phase):
                p = {"cond_up": cond_up} if factors else None
                return expand_frames_window(p, slab.astype(jnp.float32),
                                            hop, phase, count, factors)

            self._expand_cache[count] = fn
        cond_up = self.params.get("cond_up") if self._factors else None
        return fn(cond_up, jnp.asarray(slab, self._cond_wire), phase)

    def _expand_frames_sparse(self, slab, phase, lane_of, count: int):
        """Active-lanes-only variant of :meth:`_expand_frames`: expand a
        ``(w, Fs, M)`` slab holding just the conditioned riders' frame
        windows and scatter the expanded rows into the full
        ``(lanes, count, M)`` cond block ON DEVICE — the wire carries
        ``w/lanes`` of the dense slab (~26 KB instead of ~820 KB for 8
        riders on a 256-lane vocoder pool). Every other lane's rows are
        exact zeros, which is bitwise what the dense path's zero slab
        rows expand to (both expanders are bias-free linear maps).
        Jitted per (count, w); w buckets to powers of two upstream."""
        w = slab.shape[0]
        fn = self._expand_sparse_cache.get((count, w))
        if fn is None:
            hop, factors = self.cond_hop, self._factors
            lanes, M = self.lanes, self.cfg.cond_channels
            from ..ops.mel import expand_frames_window

            @jax.jit
            def fn(cond_up, slab, phase, lane_of):
                p = {"cond_up": cond_up} if factors else None
                rows = expand_frames_window(
                    p, slab.astype(jnp.float32), hop, phase, count,
                    factors)
                full = jnp.zeros((lanes, count, M), rows.dtype)
                return full.at[lane_of].set(rows)

            self._expand_sparse_cache[(count, w)] = fn
        cond_up = self.params.get("cond_up") if self._factors else None
        return fn(cond_up, jnp.asarray(slab, self._cond_wire), phase,
                  lane_of)

    def _build_splice(self):
        """The jitted on-device admission splice. Re-bases each layer's
        ring slots from the request-local clock to the batcher's (ring
        slot = t mod period, so shifting the clock by delta is a
        ``(slot - delta) mod P`` gather of the slot axis), zero-fills the
        slots a short solo prime never wrote (slot s of a period-P ring was
        written iff s < t_local when t_local < P), and scatters the columns
        into the pool ring at the target lanes. One device call per
        admission group: the previous host-side path materialized the FULL
        primed ring to host, np.roll'ed it, and re-uploaded — at chaconne
        x1024 lanes that is ~400 MB each way per admission burst, which
        measured as ~25x serving overhead on capacity loads."""
        from functools import partial as _partial

        periods, ring_off = self._periods, self._ring_off
        R = self.cfg.residual_channels

        @_partial(jax.jit, donate_argnums=(0, 1))
        def splice(ring, cls, primed, firsts, lane_idx, src, t0, t_local):
            cols = []
            for l, P in enumerate(periods):
                base = int(ring_off[l]) * R
                blk = primed[base : base + P * R].reshape(P, R, -1)
                slot = jnp.arange(P)
                blk = jnp.where(
                    slot[:, None, None] < jnp.minimum(t_local, P), blk, 0)
                idx = jnp.mod(slot - jnp.mod(t0 - t_local, P), P)
                cols.append(blk[idx].reshape(P * R, -1))
            colcat = jnp.concatenate(cols, axis=0)
            # src deduplicates the lane-padding: dummy entries are copies
            # of entry 0, so duplicate scatter indices write identical
            # values and the dummy writes are no-ops. firsts arrives at the
            # prime call's padded width and gathers through src on device —
            # keeping admission sync-free (no host materialization of the
            # prime output anywhere on the admission path).
            colcat = jnp.take(colcat, src, axis=1).astype(ring.dtype)
            ring = ring.at[:, lane_idx].set(colcat)
            cls = cls.at[lane_idx].set(jnp.take(firsts, src))
            return ring, cls

        return splice

    def _align_and_insert(self, primed, t_local: int,
                          lanes: list[int], firsts):
        """Splice a primed group into the pool on device (see
        :meth:`_build_splice`); neither the ring state nor the first
        samples (``firsts``: the prime call's device-resident (W,) output
        column) visit the host."""
        if self._splice is None:
            self._splice = self._build_splice()
        n = len(lanes)
        W = primed.shape[1]  # the prime call's lane-padded width
        src = np.concatenate(
            [np.arange(n), np.zeros(W - n, np.int64)])
        lane_idx = np.asarray(lanes, np.int32)[src]
        t0 = time.perf_counter()
        ring, cls = self._splice(
            self._state.ring, self._state.cls, primed,
            jnp.asarray(firsts, jnp.int32), jnp.asarray(lane_idx),
            jnp.asarray(src, jnp.int32),
            jnp.asarray(self._global_t(), jnp.int32),
            jnp.asarray(t_local, jnp.int32),
        )
        self._t["t_splice"] += time.perf_counter() - t0
        self._state = HbmGenState(ring=ring, t=self._state.t, cls=cls)

    def _ensure_state(self):
        """Bootstrap the shared state: an all-zero ring (the reference's
        zero-filled queues) with the pool clock already PAST every warm-up
        predicate. The kernel gates a tap with lookback m on ``ta >= m``
        (cold-start semantics); a pool admits lanes at arbitrary clock
        positions, so those predicates must never fire again — starting at
        t = max(period) makes them always-true forever, and 'missing
        history' is represented by zeroed ring slots instead, which is
        exactly what the predicate would have contributed."""
        if self._state is not None:
            return
        R = self.cfg.residual_channels
        self._clock = max(self._periods)
        self._state = HbmGenState(
            ring=jnp.zeros((int(self._ring_off[-1]) * R, self.lanes),
                           self._kw["ring_dtype"]),
            t=jnp.asarray(self._clock, jnp.int32),
            cls=jnp.full((self.lanes,), self.cfg.classes // 2, jnp.int32),
        )
        if self.mesh is not None:  # lane axis sharded over the data axis
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS

            lane = NamedSharding(self.mesh, P(DATA_AXIS))
            self._state = HbmGenState(
                ring=jax.device_put(
                    self._state.ring,
                    NamedSharding(self.mesh, P(None, DATA_AXIS))),
                t=jax.device_put(
                    self._state.t, NamedSharding(self.mesh, P())),
                cls=jax.device_put(self._state.cls, lane),
            )

    # --------------------------------------------------------------- loop

    def _admit(self):
        batch: list[_Pending] = []
        while len(batch) < len(self._free) and not self._submit_q.empty():
            p = self._submit_q.get()
            if p.handle.cancelled():
                self._n["cancelled"] += 1
                p.handle._finish(RequestCancelled("request cancelled"))
            else:
                batch.append(p)
        if not batch:
            return
        self._ensure_state()
        by_len: dict[int, list[_Pending]] = {}
        for p in batch:
            by_len.setdefault(p.prime.size, []).append(p)
        for group in by_len.values():
            p0 = self._t["t_prime_dispatch"]
            s0 = self._t["t_splice"]
            try:
                cols, t_local, firsts = self._prime_states(group)
            except BaseException as e:  # surface to callers, keep serving
                self._n["failed"] += len(group)
                for p in group:
                    p.handle._finish(e)
                continue
            lanes = [self._free.pop() for _ in group]
            try:
                self._align_and_insert(cols, t_local, lanes, firsts)
            except BaseException as e:
                self._free.extend(lanes)
                self._n["failed"] += len(group)
                for p in group:
                    p.handle._finish(e)
                continue
            self._n["admitted"] += len(group)
            prime_s = self._t["t_prime_dispatch"] - p0
            splice_s = self._t["t_splice"] - s0
            now = time.perf_counter()
            recs = []
            for i, (pend, lane) in enumerate(zip(group, lanes)):
                self._temps[lane] = pend.temperature
                self._seeds[lane] = pend.seed
                # rebase the lane's noise clock: request-local time =
                # pool time + toff, constant from admission on
                self._toffs[lane] = t_local - self._global_t()
                tm = pend.handle.timing
                tm["t_admitted"] = now
                tm["prime_s"] = prime_s
                tm["splice_s"] = splice_s
                tm["group"] = len(group)
                rest, coff = None, 0
                if pend.cond is not None:
                    if self.cond_hop is not None:  # frames mode: keep the
                        rest = pend.cond  # timeline, track the row offset
                        coff = pend.prime.size
                    else:  # rows the prime didn't consume
                        rest = pend.cond[pend.prime.size :]
                act = _Active(pend.handle, lane,
                              pend.handle.num_samples - 1, rest, coff)
                if act.remaining <= 0:
                    # single-sample request: the lane frees right away (its
                    # one sample is already captured in the prime output
                    # column); completion fires at firsts delivery
                    self._temps[lane] = 0.0
                    self._free.append(lane)
                else:
                    self._active.append(act)
                recs.append((pend.handle, act, i))
            # first samples are a device future: materialized and delivered
            # by _deliver_firsts AFTER the next chunk dispatch, so admission
            # never stalls the pipeline (see _prime_states)
            self._deferred.append((firsts, recs))

    def _deliver_firsts(self):
        """Materialize deferred admission outputs and deliver each new
        request's first sample. Runs after the worker has dispatched the
        next chunk: the block here rides device work that is already
        queued, never idling the device (the whole point of deferral).

        Failure semantics: deferral moves prime-kernel RUNTIME errors
        from _admit's per-group containment to here — and by now the
        splice has already mixed the failed prime into the shared ring,
        so the pool restart (_run -> _fail_all) is the correct blast
        radius, not a regression. (Compile/shape errors still raise
        synchronously inside _admit and stay group-local.) On any error
        every swapped-out handle is resolved before re-raising — a
        single-sample request's handle lives only in this list, and an
        unresolved one would block its caller forever."""
        if not self._deferred:
            return
        t0 = time.perf_counter()
        batches, self._deferred = self._deferred, []
        try:
            self._deliver_firsts_inner(batches)
        except BaseException as e:
            for _firsts, recs in batches:
                for handle, _act, _row in recs:
                    if not handle.done():
                        self._n["failed"] += 1
                        handle._finish(e)
            raise
        finally:
            self._t["t_prime_sync"] += time.perf_counter() - t0

    def _deliver_firsts_inner(self, batches):
        for firsts_dev, recs in batches:
            firsts = np.asarray(firsts_dev).astype(np.int32, copy=False)
            for handle, act, row in recs:
                if handle.done():  # failed/reaped since admission
                    continue
                if handle.cancelled():
                    if act.remaining > 0:
                        continue  # _reap_cancelled owns active lanes
                    self._n["cancelled"] += 1
                    handle._finish(RequestCancelled("request cancelled"))
                    continue
                handle.timing["t_first"] = time.perf_counter()
                try:
                    handle._deliver(np.asarray([firsts[row]], np.int32))
                    self._n["samples_out"] += 1
                except BaseException as e:  # a caller's on_chunk raised —
                    if act.remaining > 0:  # fail that request, keep serving
                        self._temps[act.lane] = 0.0
                        self._free.append(act.lane)
                        self._active = [a for a in self._active
                                        if a is not act]
                    self._n["failed"] += 1
                    handle._finish(e)
                    continue
                if act.remaining <= 0:
                    self._n["completed"] += 1
                    handle._finish()

    def _reap_cancelled(self):
        """Drop cancelled requests at the chunk boundary, freeing their
        lanes (a disconnected streaming client must not hold a lane for the
        rest of its clip)."""
        still = []
        for act in self._active:
            if act.handle.cancelled():
                self._temps[act.lane] = 0.0
                self._free.append(act.lane)
                self._n["cancelled"] += 1
                act.handle._finish(RequestCancelled("request cancelled"))
            else:
                still.append(act)
        self._active = still

    def _fail_all(self, error: BaseException):
        """A device step failed: the shared state is suspect, so fail every
        rider and restart the pool from a fresh bootstrap."""
        # count only still-unresolved handles: when _deliver_firsts raised,
        # its except block already counted+finished the riders it owned, and
        # recounting them here would double-count stats()['failed']
        for act in self._active:
            if not act.handle.done():
                self._n["failed"] += 1
                act.handle._finish(error)
        self._active = []
        # deferred-firsts handles not on an active lane (single-sample
        # requests) would otherwise block their callers forever
        for _, recs in self._deferred:
            for handle, _act, _row in recs:
                if not handle.done():
                    self._n["failed"] += 1
                    handle._finish(error)
        self._deferred = []
        self._free = list(range(self.lanes))
        self._temps[:] = 0.0
        self._state = None

    def _step_pool(self, n: int, cond, temps, seeds, toffs):
        """One device pool step of ``n`` samples on the current shared
        state; advances the host clock mirror. The ONE place the pool-step
        program is invoked — the live dispatch and prewarm both go through
        it, so the warm compiles are guaranteed to be the production
        programs (jit keys on shapes/dtypes, which these calls share)."""
        if self.mesh is not None:
            from ..parallel.training import sharded_pool_step

            kw = {k: v for k, v in self._kw.items() if k != "pad_streams"}
            cls, self._state = sharded_pool_step(
                self.params, self.cfg, self.mesh, self._next_key(),
                n, self._state, temperature=temps,
                lane_seed=seeds, lane_clock=toffs, cond=cond, **kw,
            )
        else:
            _, cls, self._state = generate_fast_batched(
                self.params, self.cfg, self._next_key(), n, None,
                temperature=temps, state=self._state, cond=cond,
                return_state=True, lane_seed=seeds, lane_clock=toffs,
                **self._kw,
            )
        self._clock += n  # admissions after this dispatch rebase
        # against the advanced clock (state.t moves with the dispatch)
        return cls

    @staticmethod
    def _pow2_bucket(k: int) -> int:
        """Smallest power of two >= k — jit-program width bucketing (a
        raw count would compile a fresh program per distinct value)."""
        w = 1
        while w < k:
            w *= 2
        return w

    def _sparse_buckets(self) -> list[int]:
        """Every width the sparse download/cond paths can pick at
        runtime: their gates fire only while ``k * 2 <= lanes``, so the
        buckets are the powers of two up to ``_pow2_bucket(lanes // 2)``
        — computed from the SAME bucket function the dispatch uses, so
        prewarm coverage and runtime widths cannot drift (a hand-rolled
        warm loop once stopped one bucket short for non-power-of-two
        lane counts)."""
        top = self._pow2_bucket(max(1, self.lanes // 2))
        out, w = [], 1
        while w <= top:
            out.append(w)
            w *= 2
        return out

    def _wire_dtype(self):
        """Narrowest dtype that holds a class id — the device->host chunk
        transfer shrinks 4x for the canonical 256-class models (uint8) and
        2x up to 32k classes (int16); `t_deliver` is the dominant capacity
        term wherever the host link is slow, so wire bytes are capacity.
        The host re-widens to int32 on delivery."""
        if self.cfg.classes <= 256:
            return jnp.uint8
        if self.cfg.classes <= 32768:
            return jnp.int16
        return jnp.int32

    def _pick_chunk(self) -> int:
        """Chunk width for the next dispatch: the short ``light_chunk``
        while the pool is lightly loaded (low TTFA), the full ``chunk``
        under load (amortizes per-chunk overheads)."""
        if self.light_chunk is None:
            return self.chunk
        load = len(self._active) + self._submit_q.qsize()
        return (self.light_chunk
                if load <= self.light_threshold * self.lanes
                else self.chunk)

    def _dispatch_chunk(self):
        """Enqueue one pool step on the device and return ``(cls, riders,
        rows, n)`` WITHOUT materializing the result — jax dispatch is
        asynchronous, so the device starts computing while the worker goes
        on to deliver the PREVIOUS chunk (host-side delivery and the
        device step overlap; see _run). ``riders`` snapshots the active
        list as of this dispatch; ``n`` is this dispatch's chunk width."""
        n = self._pick_chunk()
        cond = None
        if any(act.cond is not None for act in self._active):
            if self.cond_hop is not None:
                # frames mode: ship only each lane's frame WINDOW for this
                # chunk and expand to sample rate on device — hop x less
                # host->device traffic than the dense rows slab
                from ..ops.mel import frames_window_len

                hop = self.cond_hop
                Fs = frames_window_len(n, hop, self._factors)
                riders_c = [a for a in self._active if a.cond is not None]
                sparse = len(riders_c) * 2 <= self.lanes
                # lightly loaded pools ship only the ACTIVE lanes' frame
                # rows (bucketed to a power of two; dummies repeat row 0's
                # lane — identical values, so the duplicate scatter is a
                # no-op) and scatter the expanded rows on device: the
                # full-width slab costs lanes/active x more wire for rows
                # that expand to cond nobody reads
                crows = (self._pow2_bucket(len(riders_c)) if sparse
                         else self.lanes)
                slab = np.zeros(
                    (crows, Fs, self.cfg.cond_channels), np.float32)
                phase = np.zeros(crows, np.int32)
                lane_of = np.zeros(crows, np.int32)
                for i, act in enumerate(riders_c):
                    row = i if sparse else act.lane
                    fs = act.cond_off // hop
                    idx = np.minimum(fs + np.arange(Fs),
                                     act.cond.shape[0] - 1)
                    slab[row] = act.cond[idx]
                    phase[row] = act.cond_off - fs * hop
                    lane_of[row] = act.lane
                    act.cond_off += n
                if sparse and crows > len(riders_c):
                    # dummy rows duplicate row 0 ENTIRELY (window, phase,
                    # lane) so the duplicate scatter writes identical
                    # values — same no-op trick as the admission splice
                    k = len(riders_c)
                    slab[k:] = slab[0]
                    phase[k:] = phase[0]
                    lane_of[k:] = lane_of[0]
                self._n["bytes_up"] += slab.size * self._cond_wire.itemsize
                if sparse:
                    cond = self._expand_frames_sparse(
                        slab, jnp.asarray(phase), jnp.asarray(lane_of), n)
                else:
                    cond = self._expand_frames(
                        slab, jnp.asarray(phase), n)
            else:
                # assemble this chunk's per-lane cond rows; finished/free/
                # unconditioned lanes ride zero rows
                cond = np.zeros(
                    (self.lanes, n, self.cfg.cond_channels),
                    np.float32)
                for act in self._active:
                    if act.cond is not None:
                        k = min(n, act.cond.shape[0])
                        cond[act.lane, :k] = act.cond[:k]
                        act.cond = act.cond[k:]
                self._n["bytes_up"] += cond.size * 4
                cond = jnp.asarray(cond)
        self._n["pool_steps"] += 1
        if self.mesh is not None:
            cls = self._step_pool(n, cond, self._temps, self._seeds,
                                  self._toffs)
        else:
            if self._host_args is None or not (
                    np.array_equal(self._temps, self._host_args[0])
                    and np.array_equal(self._seeds, self._host_args[1])
                    and np.array_equal(self._toffs, self._host_args[2])):
                self._host_args = (self._temps.copy(), self._seeds.copy(),
                                   self._toffs.copy())
                self._dev_args = tuple(jnp.asarray(a)
                                       for a in self._host_args)
            cls = self._step_pool(n, cond, self._dev_args[0],
                                  self._dev_args[1], self._dev_args[2])
        cls = cls.astype(self._wire_dtype(), copy=False)
        riders = list(self._active)
        rows = None
        if riders and len(riders) * 2 <= self.lanes:
            # lightly loaded pool: download only the active lanes' rows
            # (free lanes' greedy output is discarded anyway). The
            # selection width buckets to powers of two — a raw count
            # would compile a fresh gather program per distinct rider
            # count, on the hot dispatch path; dummy entries repeat
            # row 0 (reads, so duplicates are harmless).
            w = self._pow2_bucket(len(riders))
            sel = np.zeros(w, np.int32)
            sel[: len(riders)] = [a.lane for a in riders]
            sel[len(riders):] = sel[0]
            cls = jnp.take(cls, jnp.asarray(sel), axis=0)
            rows = {id(a): i for i, a in enumerate(riders)}
        self._n["bytes_down"] += int(cls.shape[0]) * n * cls.dtype.itemsize
        return cls, riders, rows, n

    def _deliver_chunk(self, cls, riders, rows=None, n=None):
        """Materialize a dispatched chunk (blocks until the device step
        completes) and distribute it to its riders. A rider that finished
        or was cancelled after the dispatch is skipped — its trailing
        samples are discarded, like a free lane's greedy output. ``rows``
        maps rider identity to its row when the dispatch downloaded only
        the active lanes (lightly loaded pools); None = rows are lanes.
        ``n`` is the dispatch's chunk width (adaptive chunking)."""
        if n is None:
            n = self.chunk
        cls = np.asarray(cls).astype(np.int32, copy=False)
        still = []
        rider_ids = {id(a) for a in riders}
        for act in self._active:
            if id(act) not in rider_ids:  # admitted after this dispatch
                still.append(act)
                continue
            take = min(act.remaining, n)
            row = act.lane if rows is None else rows[id(act)]
            try:
                act.handle._deliver(cls[row, :take])
                self._n["samples_out"] += take
            except BaseException as e:  # caller's on_chunk raised
                self._temps[act.lane] = 0.0
                self._free.append(act.lane)
                self._n["failed"] += 1
                act.handle._finish(e)
                continue
            act.remaining -= take
            if act.remaining <= 0:
                self._temps[act.lane] = 0.0
                self._free.append(act.lane)
                self._n["completed"] += 1
                act.handle._finish()
            else:
                still.append(act)
        self._active = still

    def _run(self):
        # Nothing may escape this loop while the pool is open: an exception
        # that killed the thread would leave every active and future handle
        # blocked forever. Per-request failures are handled inline; a failed
        # device step fails its riders and re-bootstraps the pool.
        # One-chunk-deep pipeline: dispatch chunk i+1 (async) BEFORE
        # materializing chunk i, so per-chunk host work (device->host
        # transfer, on_chunk callbacks, socket writes) overlaps the next
        # device step instead of serializing with it. Admissions happen
        # between the two, against the already-advanced state, and
        # deliveries pair each chunk with its dispatch-time rider
        # snapshot, so per-lane outputs are unchanged.
        pending = None  # (cls future, riders) of the in-flight chunk
        while not self._closing:
            try:
                if self._staged_params is not None:
                    with self._count_lock:  # atomic take: a reload racing
                        staged = self._staged_params  # this window must
                        self._staged_params = None  # never be dropped
                    if staged is not None:
                        self.params = staged
                self._reap_cancelled()
                t0 = time.perf_counter()
                self._admit()
                t1 = time.perf_counter()
                self._t["t_admit"] += t1 - t0
                nxt = self._dispatch_chunk() if self._active else None
                t2 = time.perf_counter()
                self._t["t_dispatch"] += t2 - t1
                # materialize admission outputs only now — the next chunk
                # is already queued behind the prime, so this wait costs
                # the device nothing (t_prime_sync accounts it)
                self._deliver_firsts()
                t3 = time.perf_counter()
                if pending is not None:
                    self._deliver_chunk(*pending)
                    self._t["t_deliver"] += time.perf_counter() - t3
                pending = nxt
                if pending is None and not self._active:
                    t3 = time.perf_counter()
                    self._wake.wait(timeout=0.1)
                    self._wake.clear()
                    self._t["t_idle"] += time.perf_counter() - t3
            except BaseException as e:
                pending = None
                self._fail_all(e)
        try:  # flush deferred first samples before the final chunk drain
            self._deliver_firsts()
        except BaseException as e:
            self._fail_all(e)
        if pending is not None:  # drain the in-flight chunk: its riders'
            try:  # final samples must not vanish on a graceful close
                self._deliver_chunk(*pending)
            except BaseException as e:
                self._fail_all(e)
        for act in self._active:
            act.handle._finish(RuntimeError("batcher closed"))
        while not self._submit_q.empty():
            self._submit_q.get().handle._finish(
                RuntimeError("batcher closed"))
