"""Multi-host sharded checkpointing (SURVEY §5 "multi-host async save").

Round 2's AsyncCheckpointer silently degraded under cross-process sharding:
leaves that weren't fully addressable fell back to a BLOCKING save that
allgathered every shard to every host. The sharded format removes both
regressions — each process writes only its own addressable shards from its
own background thread, process 0 writes a manifest, and the loader
reassembles full arrays under any topology.

Coverage here:
- single-process roundtrip of a mesh-sharded model + optimizer state
  (bitwise, including from_state_dict through an opt-state template)
- latest_checkpoint integration: complete sharded dirs compete by step,
  incomplete ones (save in flight / crashed) are never "latest"
- a REAL two-process run (jax.distributed over CPU, 4 local devices each):
  params sharded across processes are NOT fully addressable, the async
  saver must keep the write on the background thread (no blocking
  fallback), each process writes only its own shard file, and a fresh
  single-process loader reassembles the exact global values.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import pytorch_wavenet_tpu as wt
from pytorch_wavenet_tpu.training.optimizers import reference_adam
from pytorch_wavenet_tpu.utils import checkpoints


def _mesh(shape=(4, 2)):
    devs = np.array(jax.devices()[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(devs, ("data", "model"))


@pytest.fixture(scope="module")
def sharded_setup():
    cfg = wt.get_config("tiny")
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    tx = reference_adam(1e-3, weight_decay=0.01, gradient_clipping=1.0)
    opt_state = tx.init(params)
    mesh = _mesh()
    from pytorch_wavenet_tpu.parallel.sharding import (
        shard_opt_state, shard_params,
    )

    sp = shard_params(params, cfg, mesh)
    so = shard_opt_state(tx.init(sp), sp, mesh)
    return cfg, params, tx, opt_state, mesh, sp, so


def test_sharded_roundtrip_bitwise(sharded_setup, tmp_path):
    cfg, params, tx, _, mesh, sp, so = sharded_setup
    path = checkpoints.save_checkpoint_sharded(
        str(tmp_path), "m", 7, sp, opt_state=so, cfg=cfg,
        extra={"note": "hi"},
    )
    assert os.path.isdir(path)
    assert os.path.isfile(os.path.join(path, "manifest.msgpack"))
    assert os.path.isfile(os.path.join(path, "shards_p0.msgpack"))

    blob = checkpoints.load_checkpoint_sharded(path, opt_state_template=so)
    assert blob["step"] == 7
    assert blob["extra"] == {"note": "hi"}
    assert blob["config"].to_json() == cfg.to_json()
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(blob["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # opt state restored through the template: same structure, same values
    for a, b in zip(jax.tree_util.tree_leaves(so),
                    jax.tree_util.tree_leaves(blob["opt_state"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_dispatch_and_latest(sharded_setup, tmp_path):
    cfg, params, tx, opt_state, mesh, sp, so = sharded_setup
    # plain file at step 10, sharded dir at step 20 -> sharded wins
    wt.save_checkpoint(str(tmp_path), "m", 10, params, cfg=cfg)
    p20 = checkpoints.save_checkpoint_sharded(
        str(tmp_path), "m", 20, sp, cfg=cfg
    )
    assert checkpoints.latest_checkpoint(str(tmp_path)) == p20
    # load_checkpoint dispatches on the directory
    blob = wt.load_checkpoint(p20)
    assert blob["step"] == 20

    # an incomplete sharded dir (manifest promises 2 shard files) at a
    # higher step must NOT be picked as latest, and must refuse to load
    p30 = checkpoints.save_checkpoint_sharded(str(tmp_path), "m", 30, sp)
    man = os.path.join(p30, "manifest.msgpack")
    from flax import serialization

    with open(man, "rb") as f:
        manifest = serialization.msgpack_restore(f.read())
    manifest["process_count"] = 2
    with open(man, "wb") as f:
        f.write(serialization.msgpack_serialize(manifest))
    assert checkpoints.latest_checkpoint(str(tmp_path)) == p20
    with pytest.raises(FileNotFoundError, match="incomplete"):
        checkpoints.load_checkpoint_sharded(p30)

    # load_latest_model_from consumes the sharded winner end-to-end
    blob = wt.load_latest_model_from(str(tmp_path))
    assert blob["step"] == 20


def test_sharded_coverage_check(sharded_setup, tmp_path):
    """Dropping a leaf's shard entries must fail loudly, not zero-fill."""
    cfg, *_ , sp, so = sharded_setup
    path = checkpoints.save_checkpoint_sharded(str(tmp_path), "m", 1, sp)
    from flax import serialization

    sf = os.path.join(path, "shards_p0.msgpack")
    with open(sf, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    # amputate one shard entry of a sharded leaf
    key = next(k for k, v in blob["shards"].items()
               if len(v) > 1 and k.startswith("params/"))
    entries = blob["shards"][key]
    if isinstance(entries, dict):
        entries.pop(sorted(entries, key=int)[0])
    else:
        entries.pop(0)
    with open(sf, "wb") as f:
        f.write(serialization.msgpack_serialize(blob))
    with pytest.raises(ValueError, match="missing data"):
        checkpoints.load_checkpoint_sharded(path)


def test_async_checkpointer_stays_async_when_sharded(sharded_setup, tmp_path):
    """The async saver must route sharded trees to the sharded writer on
    its background thread (round-2 behavior: blocking fallback)."""
    cfg, *_, sp, so = sharded_setup
    # make the tree look non-fully-addressable the way a pod slice would,
    # without needing >1 process: monkeypatching jax.Array is impossible,
    # so drive the writer-selection logic directly instead
    ckpt = checkpoints.AsyncCheckpointer()
    try:
        fut = ckpt.save(str(tmp_path), "m", 3, sp, opt_state=so, cfg=cfg)
        # the future is the pool's (pending or done), not a pre-resolved
        # stub: _pending must be set (round-2's fallback returned a
        # completed Future and left _pending None)
        assert ckpt._pending is fut
        path = ckpt.wait()
        blob = wt.load_checkpoint(path, opt_state_template=so)
        assert blob["step"] == 3
    finally:
        ckpt.close()


_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from pytorch_wavenet_tpu.utils import checkpoints

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    gshape = (16, 6)
    glob = np.arange(96, dtype=np.float32).reshape(gshape)
    arr = jax.make_array_from_callback(
        gshape, NamedSharding(mesh, P("data", None)), lambda i: glob[i])
    # replicated leaf: exactly one process must write it
    rep = jax.make_array_from_callback(
        (4,), NamedSharding(mesh, P()), lambda i: np.ones(4, np.float32))
    params = {"w": arr, "rep": rep}
    assert not arr.is_fully_addressable

    ckpt = checkpoints.AsyncCheckpointer()
    fut = ckpt.save(outdir, "mh", 5, params)
    # the write must be on the background thread, not a blocking fallback
    assert ckpt._pending is fut, "blocking fallback engaged"
    path = ckpt.wait()
    ckpt.close()

    # each process wrote exactly its own shard file
    mine = os.path.join(path, f"shards_p{pid}.msgpack")
    assert os.path.isfile(mine)
    if pid == 0:
        assert os.path.isfile(os.path.join(path, "manifest.msgpack"))
        # completeness is cross-process-eventual (each process lands its
        # file independently, no barrier) — consumers poll exactly like
        # latest_checkpoint does; wait for process 1's file
        import time
        deadline = time.time() + 60
        while checkpoints._sharded_files(path)[1] is None:
            if time.time() > deadline:
                raise TimeoutError("peer shard file never landed")
            time.sleep(0.2)
        # every byte of the global value reassembles exactly
        blob = checkpoints.load_checkpoint_sharded(path)
        np.testing.assert_array_equal(blob["params"]["w"], glob)
        np.testing.assert_array_equal(blob["params"]["rep"],
                                      np.ones(4, np.float32))
        # the replicated leaf was written once, not once per process
        from flax import serialization
        total = 0
        for k in range(2):
            with open(os.path.join(path, f"shards_p{k}.msgpack"), "rb") as f:
                sh = serialization.msgpack_restore(f.read())
            e = sh["shards"].get("params/rep", [])
            total += len(e)
        assert total == 1, f"replicated leaf written {total} times"
    print(f"proc {pid} OK", flush=True)
""")


def test_two_process_async_sharded_save(tmp_path):
    """Real cross-process sharding: two jax.distributed CPU processes, the
    async save stays async on each, and the result loads exactly."""
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    outdir = str(tmp_path / "ckpts")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(k), outdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for k in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("two-process checkpoint workers timed out")
        outs.append(out)
    for k, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {k} failed:\n{out}"
        assert f"proc {k} OK" in out
