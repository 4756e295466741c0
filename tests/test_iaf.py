"""Parallel-WaveNet distillation: IAF student (models/iaf.py) and
probability density distillation (training/distill.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_wavenet_tpu as wt
from pytorch_wavenet_tpu.models.iaf import (
    IAFConfig,
    flow_transform,
    init_student,
    student_generate,
    student_parameter_count,
    student_sample,
)
from pytorch_wavenet_tpu.training.distill import (
    distill_loss,
    distill_step,
    mu_law_bin_edges,
    power_spectrum,
    student_bin_logprobs,
)

SCFG = IAFConfig(flows=2, layers=2, blocks=1, residual_channels=8,
                 dilation_channels=8, skip_channels=8, end_channels=8)


def test_identity_at_init():
    """Zero-initialized flow heads: the student starts as the identity on
    its base noise (mu=0, log_s=0), so log_q is the exact base density."""
    params = init_student(jax.random.PRNGKey(0), SCFG)
    out = student_sample(params, SCFG, jax.random.PRNGKey(1), (2, 32))
    np.testing.assert_array_equal(np.asarray(out.x), np.asarray(out.z0))
    np.testing.assert_array_equal(np.asarray(out.log_s), 0.0)
    np.testing.assert_array_equal(np.asarray(out.m), 0.0)
    z = np.asarray(out.z0)
    base = -z - 2 * np.log1p(np.exp(-z))
    np.testing.assert_allclose(np.asarray(out.log_q), base.sum(axis=1),
                               rtol=1e-5)


def test_flow_causality():
    """(mu_t, log_s_t) depend on z_{<t} only: perturbing z from position t0
    onward leaves outputs up to and including t0 unchanged."""
    params = init_student(jax.random.PRNGKey(2), SCFG)
    fp = params["flows"][0]
    # make the head non-trivial so the test has teeth
    fp = dict(fp, end2={"w": jnp.ones((8, 2)) * 0.3,
                        "b": jnp.zeros((2,))})
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 24))
    mu, ls = flow_transform(fp, SCFG, z)
    t0 = 11
    z2 = z.at[:, t0:].add(1.7)
    mu2, ls2 = flow_transform(fp, SCFG, z2)
    np.testing.assert_array_equal(np.asarray(mu[:, : t0 + 1]),
                                  np.asarray(mu2[:, : t0 + 1]))
    np.testing.assert_array_equal(np.asarray(ls[:, : t0 + 1]),
                                  np.asarray(ls2[:, : t0 + 1]))
    assert not np.array_equal(np.asarray(mu), np.asarray(mu2))


def test_bin_probs_sum_to_one_and_kl_nonneg():
    C = 16
    edges = mu_law_bin_edges(C)
    assert edges.shape == (C + 1,)
    assert np.isneginf(edges[0]) and np.isposinf(edges[-1])
    assert np.all(np.diff(edges[1:-1]) > 0)
    key = jax.random.PRNGKey(4)
    m = jax.random.normal(key, (3, 20)) * 0.5
    log_s = jax.random.normal(jax.random.fold_in(key, 1), (3, 20)) - 1.0
    q = student_bin_logprobs(m, log_s, C)
    assert q.shape == (3, 20, C)
    assert float(jnp.min(q)) >= 0.0
    np.testing.assert_allclose(np.asarray(jnp.sum(q, -1)), 1.0, atol=1e-5)
    # KL against an arbitrary categorical is nonnegative
    logits = jax.random.normal(jax.random.fold_in(key, 2), (3, 20, C))
    logp = jax.nn.log_softmax(logits)
    kl = jnp.sum(q * (jnp.log(jnp.maximum(q, 1e-12)) - logp), axis=-1)
    assert float(jnp.min(kl)) > -1e-5


def test_distill_loss_and_grads_finite():
    tcfg = wt.get_config("tiny")
    teacher = wt.init_wavenet(jax.random.PRNGKey(5), tcfg)
    student = init_student(jax.random.PRNGKey(6), SCFG)
    loss, aux = distill_loss(student, teacher, SCFG, tcfg,
                             jax.random.PRNGKey(7), 2, 48)
    assert np.isfinite(float(loss)) and float(aux["kl"]) >= 0.0
    grads = jax.grad(
        lambda p: distill_loss(p, teacher, SCFG, tcfg,
                               jax.random.PRNGKey(7), 2, 48)[0]
    )(student)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # identity-init student is not a stationary point: some gradient flows
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)


def test_distillation_reduces_kl():
    """A few dozen steps of distillation against a fixed random teacher
    must reduce the (fixed-noise) KL — the student is learning the
    teacher's unconditional distribution."""
    import optax

    tcfg = wt.get_config("tiny")
    teacher = wt.init_wavenet(jax.random.PRNGKey(8), tcfg)
    student = init_student(jax.random.PRNGKey(9), SCFG)
    tx = optax.adam(3e-3)
    opt = tx.init(student)
    key = jax.random.PRNGKey(10)
    eval_kl = lambda p: float(
        distill_loss(p, teacher, SCFG, tcfg, jax.random.PRNGKey(99),
                     2, 48)[0]
    )
    kl0 = eval_kl(student)
    for i in range(40):
        student, opt, loss, aux = distill_step(
            student, opt, teacher, SCFG, tcfg, tx,
            jax.random.fold_in(key, i), 2, 48,
        )
    kl1 = eval_kl(student)
    assert np.isfinite(kl1)
    assert kl1 < kl0, (kl0, kl1)


def test_student_generate_shape_and_speed_path():
    params = init_student(jax.random.PRNGKey(11), SCFG)
    wav = student_generate(params, SCFG, jax.random.PRNGKey(12), 300,
                           num_streams=3)
    assert wav.shape == (3, 300)
    w = np.asarray(wav)
    assert w.min() >= -1.0 and w.max() <= 1.0
    assert student_parameter_count(params) > 0


def test_student_conditioning():
    scfg = IAFConfig(flows=1, layers=2, blocks=1, residual_channels=8,
                     dilation_channels=8, skip_channels=8, end_channels=8,
                     cond_channels=3, gcond_channels=2)
    params = init_student(jax.random.PRNGKey(13), scfg)
    # non-trivial head so conditioning reaches the output
    f0 = dict(params["flows"][0])
    f0["end2"] = {"w": jnp.ones((8, 2)) * 0.1, "b": jnp.zeros((2,))}
    params = {"flows": (f0,)}
    cond = jax.random.normal(jax.random.PRNGKey(14), (2, 40, 3))
    g = jax.random.normal(jax.random.PRNGKey(15), (2, 2))
    a = student_sample(params, scfg, jax.random.PRNGKey(16), (2, 40),
                       cond=cond, global_cond=g)
    b = student_sample(params, scfg, jax.random.PRNGKey(16), (2, 40))
    assert not np.array_equal(np.asarray(a.x), np.asarray(b.x))


def test_power_spectrum_and_power_loss():
    x = jax.random.normal(jax.random.PRNGKey(17), (2, 512))
    ps = power_spectrum(x)
    assert ps.shape == (129,)
    tcfg = wt.get_config("tiny")
    teacher = wt.init_wavenet(jax.random.PRNGKey(18), tcfg)
    student = init_student(jax.random.PRNGKey(19), SCFG)
    ref = jax.random.normal(jax.random.PRNGKey(20), (2, 512)) * 0.1
    loss, aux = distill_loss(student, teacher, SCFG, tcfg,
                             jax.random.PRNGKey(21), 2, 300,
                             audio_ref=ref, power_weight=0.5)
    assert "power" in aux and np.isfinite(float(loss))
    assert float(loss) == pytest.approx(
        float(aux["kl"]) + 0.5 * float(aux["power"]), rel=1e-5
    )


def test_distill_loss_conditions_the_teacher():
    """Vocoder distillation scores the teacher under the mel timeline:
    changing cond (student draw held fixed via the same key) changes the
    teacher's log-probs, hence the KL."""
    from pytorch_wavenet_tpu.models.iaf import IAFConfig, init_student
    from pytorch_wavenet_tpu.training.distill import distill_loss

    tcfg = wt.get_config("tiny_vocoder")
    teacher = wt.init_wavenet(jax.random.PRNGKey(0), tcfg)
    scfg = IAFConfig(flows=1, layers=2, blocks=1, residual_channels=8,
                     dilation_channels=8, skip_channels=8, end_channels=8,
                     cond_channels=tcfg.cond_channels)
    student = init_student(jax.random.PRNGKey(1), scfg)
    # zero the STUDENT's conditioning weights: the draw is then identical
    # for any cond, so a KL difference can only come from the teacher
    # being scored under the changed timeline
    for f in student["flows"]:
        f["layers"]["w_cond"] = jnp.zeros_like(f["layers"]["w_cond"])
    key = jax.random.PRNGKey(2)
    L = tcfg.receptive_field + 20
    cond = jax.random.normal(jax.random.PRNGKey(3),
                             (2, L, tcfg.cond_channels))
    _, aux_a = distill_loss(student, teacher, scfg, tcfg, key, 2, L,
                            cond=cond)
    _, aux_b = distill_loss(student, teacher, scfg, tcfg, key, 2, L,
                            cond=cond * 3.0)
    assert float(aux_a["rms"]) == float(aux_b["rms"])  # same draw
    assert float(aux_a["kl"]) != float(aux_b["kl"])    # teacher saw cond
