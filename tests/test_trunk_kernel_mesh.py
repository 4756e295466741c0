"""Trunk-kernel x mesh composition (VERDICT r3 #1).

The fused Pallas training trunk is opaque to GSPMD, so under a mesh it runs
per-data-shard inside a partial-manual ``shard_map`` (manual over 'data'
only; the Megatron skip/head matmuls keep their automatic 'model'-axis
sharding — models/wavenet.py). These tests pin, on the virtual 8-device CPU
mesh in interpret mode:

* one trunk-kernel ``parallel_train_step`` matches the XLA-trunk step
  (loss + updated params) at (data=8, model=1) and (data=4, model=2);
* the mesh never changes the kernel math: the sharded trunk-kernel step
  matches the unsharded trunk-kernel step tightly (per-shard pair stacking
  G differs across mesh shapes and is bitwise-equivalent by design).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_wavenet_tpu as wt
from pytorch_wavenet_tpu.models.wavenet import init_wavenet
from pytorch_wavenet_tpu.parallel.mesh import make_mesh
from pytorch_wavenet_tpu.parallel.training import (
    make_sharded_train_state,
    parallel_train_step,
    put_batch,
)

BATCH = 8


def _cfg(trunk_kernel: bool):
    # skip_channels divisible by the model axis for the Megatron split
    return wt.get_config("tiny", skip_channels=32, trunk_kernel=trunk_kernel)


def _batch(cfg):
    x = jax.random.randint(
        jax.random.PRNGKey(1), (BATCH, cfg.item_length), 0, cfg.classes
    )
    y = jax.random.randint(
        jax.random.PRNGKey(2), (BATCH, cfg.output_length), 0, cfg.classes
    )
    return x, y


def _one_step(cfg, mesh):
    """One parallel_train_step from a fixed init; returns (loss, params)."""
    params = init_wavenet(jax.random.PRNGKey(0), cfg)
    tx = wt.reference_adam(1e-3)
    params, opt_state = make_sharded_train_state(cfg, params, tx, mesh)
    x, y = _batch(cfg)
    x, y = put_batch(mesh, x, y)
    params, _, loss = parallel_train_step(
        params, opt_state, cfg, tx, x, y, mesh=mesh
    )
    return float(loss), jax.device_get(params)


@pytest.mark.parametrize("data,model", [(8, 1), (4, 2)])
def test_sharded_step_matches_xla_trunk(data, model):
    """Trunk-kernel sharded step ≡ XLA-trunk sharded step at bf16-matmul
    tolerances (the same bound the single-chip kernel tests carry)."""
    mesh = make_mesh(data=data, model=model, devices=jax.devices()[:8])
    loss_x, params_x = _one_step(_cfg(False), mesh)
    loss_k, params_k = _one_step(_cfg(True), mesh)
    assert abs(loss_x - loss_k) < 1e-4, (loss_x, loss_k)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(params_x)
    flat_k = jax.tree_util.tree_leaves(params_k)
    for (path, a), b in zip(flat_x, flat_k):
        err = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        # params moved by ~lr this step; grad-direction differences at
        # kernel-vs-XLA rounding scale bound the param delta by ~lr * tol
        assert err < 5e-5, f"{jax.tree_util.keystr(path)}: {err:.3e}"


def test_mesh_invariance_of_trunk_kernel_step():
    """Sharding must not change the kernel's math: (8,1)-sharded step ==
    single-device step on the same batch, tightly (both run the fused
    kernel; only the per-shard grid/pair split differs)."""
    cfg = _cfg(True)
    mesh8 = make_mesh(data=8, model=1, devices=jax.devices()[:8])
    mesh1 = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    loss_8, params_8 = _one_step(cfg, mesh8)
    loss_1, params_1 = _one_step(cfg, mesh1)
    assert abs(loss_8 - loss_1) < 1e-5, (loss_8, loss_1)
    flat_8, _ = jax.tree_util.tree_flatten_with_path(params_8)
    flat_1 = jax.tree_util.tree_leaves(params_1)
    for (path, a), b in zip(flat_8, flat_1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def _cond_cfg(trunk_kernel: bool):
    return wt.get_config("tiny", skip_channels=32, cond_channels=6,
                         trunk_kernel=trunk_kernel)


def _cond_batch(cfg):
    x, y = _batch(cfg)
    cond = jax.random.normal(
        jax.random.PRNGKey(5), (BATCH, cfg.item_length, 6)
    ) * 0.3
    return x, y, cond


def _one_cond_step(cfg, mesh):
    """One conditioned parallel_train_step from a fixed init; cond shards
    P('data') next to the batch. Kernel runs use f32 activation saves —
    the same exactness setting the single-device conditioned grad test
    pins (tests/test_trunk_kernel.py::test_conditioned_forward_and_grads);
    the production bf16 saves round grads at ~3e-4 through Adam's
    normalized first step, identically with and without the mesh (measured
    single-device == (8,1) to the last digit), which would swamp the
    uncond tolerances these tests share."""
    import functools

    from pytorch_wavenet_tpu.ops.pallas import trunk_kernel as tk

    params = init_wavenet(jax.random.PRNGKey(0), cfg)
    tx = wt.reference_adam(1e-3)
    params, opt_state = make_sharded_train_state(cfg, params, tx, mesh)
    x, y, cond = _cond_batch(cfg)
    x, y = put_batch(mesh, x, y)
    cond = jax.device_put(cond, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data")))
    orig = tk.fused_trunk
    try:
        if cfg.trunk_kernel:
            tk.fused_trunk = functools.partial(
                orig, save_dtype=jnp.float32
            )
        params, _, loss = parallel_train_step(
            params, opt_state, cfg, tx, x, y, cond, None, mesh
        )
    finally:
        tk.fused_trunk = orig
    return float(loss), jax.device_get(params)


@pytest.mark.parametrize("data,model", [(8, 1), (4, 2)])
def test_conditioned_sharded_step_matches_xla_trunk(data, model):
    """Vocoder (local-conditioning) parity under the mesh: the conditioned
    trunk-kernel sharded step matches the conditioned XLA-trunk sharded
    step — loss + updated params at the same tolerances as the uncond
    tests above. The cond timeline must slice per data shard alongside the
    batch; a wrong cond slice moves the loss far beyond these bounds."""
    mesh = make_mesh(data=data, model=model, devices=jax.devices()[:8])
    loss_x, params_x = _one_cond_step(_cond_cfg(False), mesh)
    loss_k, params_k = _one_cond_step(_cond_cfg(True), mesh)
    assert abs(loss_x - loss_k) < 1e-4, (loss_x, loss_k)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(params_x)
    flat_k = jax.tree_util.tree_leaves(params_k)
    for (path, a), b in zip(flat_x, flat_k):
        err = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        assert err < 5e-5, f"{jax.tree_util.keystr(path)}: {err:.3e}"


def test_conditioned_mesh_invariance_of_trunk_kernel_step():
    """Sharding must not change the conditioned kernel's math: the
    (8,1)-sharded conditioned trunk-kernel step == the single-device
    conditioned kernel step on the same batch, tightly (cond disables pair
    stacking everywhere, so even G is identical across mesh shapes)."""
    cfg = _cond_cfg(True)
    mesh8 = make_mesh(data=8, model=1, devices=jax.devices()[:8])
    mesh1 = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    loss_8, params_8 = _one_cond_step(cfg, mesh8)
    loss_1, params_1 = _one_cond_step(cfg, mesh1)
    assert abs(loss_8 - loss_1) < 1e-5, (loss_8, loss_1)
    flat_8, _ = jax.tree_util.tree_flatten_with_path(params_8)
    flat_1 = jax.tree_util.tree_leaves(params_1)
    for (path, a), b in zip(flat_8, flat_1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_conditioned_sharded_step_via_trainer():
    """The trainer's train_step carries the same conditioned mesh path
    (the live-vocoder-training entrypoint)."""
    from pytorch_wavenet_tpu.training.trainer import train_step

    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    cfg = _cond_cfg(True)
    params = init_wavenet(jax.random.PRNGKey(0), cfg)
    tx = wt.reference_adam(1e-3)
    params, opt_state = make_sharded_train_state(cfg, params, tx, mesh)
    x, y, cond = _cond_batch(cfg)
    x, y = put_batch(mesh, x, y)
    cond = jax.device_put(cond, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data")))
    params, _, loss, _ = train_step(
        params, opt_state, cfg, tx, x, y, cond, None, mesh
    )
    assert np.isfinite(float(loss))
