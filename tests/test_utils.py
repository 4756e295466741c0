"""Profiling and visualization utility tests."""

import time

import jax
import jax.numpy as jnp
import numpy as np

import pytorch_wavenet_tpu as wt
from pytorch_wavenet_tpu.utils.profiling import (
    StepTimer,
    trunk_flops,
    generation_step_flops,
    hbm_bytes_per_gen_step,
)
from pytorch_wavenet_tpu.utils.visualize import make_dot, param_summary


def test_step_timer_warmup_discard():
    t = StepTimer(warmup=2)
    for i in range(5):
        with t:
            time.sleep(0.001)
    assert len(t.times) == 3
    assert t.mean > 0 and t.best <= t.mean
    assert "ms/step" in t.summary()


def test_trunk_flops_scales():
    cfg = wt.get_config("tiny")
    f1 = trunk_flops(cfg, 1)
    f4 = trunk_flops(cfg, 4)
    assert f4 == 4 * f1
    assert generation_step_flops(cfg) == trunk_flops(cfg, 1, length=1, out_len=1)
    assert hbm_bytes_per_gen_step(cfg) > cfg.parameter_count() * 4 - 1


def test_make_dot_produces_graphviz():
    cfg = wt.get_config("tiny")
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, cfg.item_length), jnp.int32)
    dot = make_dot(lambda p, x: wt.wavenet_logits(p, cfg, x), params, x)
    assert dot.startswith("digraph jaxpr {")
    assert dot.rstrip().endswith("}")
    assert "tanh" in dot or "logistic" in dot  # the gated unit shows up


def test_param_summary_totals():
    cfg = wt.get_config("tiny")
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    s = param_summary(params)
    assert f"{cfg.parameter_count():,}" in s
    assert "w_skip" in s


def test_trace_writes_profile(tmp_path):
    from pytorch_wavenet_tpu.utils.profiling import trace

    with trace(str(tmp_path)) as d:
        jnp.ones((8, 8)).sum().block_until_ready()
    import os

    # a plugins/profile dir with at least one capture should exist
    found = False
    for root, dirs, files in os.walk(tmp_path):
        if files:
            found = True
    assert found
