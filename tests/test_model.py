"""WaveNet trunk tests: shapes, parameter counts, receptive field, causality.

Modeled on the reference's golden specs: the dilate round-trip assertions
(reference: tests/test_modules.py:8-36) become causality/receptive-field
properties of the trunk, and the hand-set-weights impulse probe
(reference: tests/wavenet_index_test.py:10-45) becomes an impulse-response
test of tap alignment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_wavenet_tpu as wt
from pytorch_wavenet_tpu.models.wavenet import embed_inputs, wavenet_logits


@pytest.fixture(scope="module")
def tiny():
    cfg = wt.get_config("tiny")
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_receptive_field_values():
    # reference: wavenet_model.py:106-109,123 — 3070 for 10x3, 4093 for 10x4
    assert wt.get_config("chaconne").receptive_field == 3070
    assert wt.get_config("saber").receptive_field == 4093
    assert wt.WaveNetConfig(layers=8, blocks=4).receptive_field == 1021


@pytest.mark.parametrize("name", ["tiny", "test_small", "saber", "chaconne"])
def test_parameter_count_matches_analytic(name):
    cfg = wt.get_config(name)
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    assert wt.parameter_count(params) == cfg.parameter_count()


def test_forward_shape(tiny):
    cfg, params = tiny
    x = jax.random.randint(jax.random.PRNGKey(1), (3, cfg.item_length), 0, cfg.classes)
    y = wt.forward(params, cfg, x)
    # reference forward flattens to (N*output_length, classes)
    # (reference: wavenet_model.py:190-195)
    assert y.shape == (3 * cfg.output_length, cfg.classes)
    y2 = wt.wavenet_logits(params, cfg, x)
    assert y2.shape == (3, cfg.output_length, cfg.classes)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2.reshape(-1, cfg.classes)))


def test_onehot_and_integer_inputs_agree(tiny):
    cfg, params = tiny
    x = jax.random.randint(jax.random.PRNGKey(2), (2, cfg.item_length), 0, cfg.classes)
    y_int = wt.forward(params, cfg, x)
    y_oh = wt.forward(params, cfg, jax.nn.one_hot(x, cfg.classes))
    # one-hot matmul vs row gather at platform matmul precision
    np.testing.assert_allclose(np.asarray(y_int), np.asarray(y_oh), atol=5e-3)


def test_causality_future_independence(tiny):
    """Logit for output position i must not depend on inputs after its window
    (the causal-conv property the reference gets from dilate()'s
    right-alignment, reference: wavenet_model.py:154-165)."""
    cfg, params = tiny
    T = cfg.item_length
    key = jax.random.PRNGKey(3)
    x = jax.random.randint(key, (1, T), 0, cfg.classes)
    y = wt.wavenet_logits(params, cfg, x)
    # perturb everything after the first output position's window
    x2 = x.at[:, cfg.receptive_field :].set(
        (x[:, cfg.receptive_field :] + 7) % cfg.classes
    )
    y2 = wt.wavenet_logits(params, cfg, x2)
    np.testing.assert_allclose(
        np.asarray(y[:, 0]), np.asarray(y2[:, 0]), atol=1e-6
    )


def test_receptive_field_tightness():
    """Perturbing the oldest in-window sample changes the output. Uses a
    shallow stack: on deep stacks the multiplicative attenuation of a
    single-sample perturbation drops below the platform's bf16 matmul
    rounding and dies exactly."""
    cfg = wt.WaveNetConfig(
        layers=2, blocks=1, dilation_channels=8, residual_channels=8,
        skip_channels=8, end_channels=8, classes=16, output_length=1,
        bias=True,
    )
    assert cfg.receptive_field == 4
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    x = jax.random.randint(jax.random.PRNGKey(3), (1, 4), 0, cfg.classes)
    y = wt.wavenet_logits(params, cfg, x, out_len=1)
    x3 = x.at[:, 0].set((x[:, 0] + 7) % cfg.classes)
    y3 = wt.wavenet_logits(params, cfg, x3, out_len=1)
    assert np.abs(np.asarray(y) - np.asarray(y3)).max() > 0


def test_impulse_response_tap_alignment():
    """Hand-set weights impulse probe (reference pattern:
    tests/wavenet_index_test.py:10-45): with identity-ish weights, a single
    layer's gated unit must mix exactly x[t] and x[t-d]."""
    cfg = wt.WaveNetConfig(
        layers=2, blocks=1, dilation_channels=1, residual_channels=1,
        skip_channels=1, end_channels=1, classes=4, output_length=4,
        kernel_size=2, bias=False,
    )
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    # layer 0 (d=1): filter reads only the OLD tap (j=0), gate saturated ~1
    L = cfg.num_layers
    w_in = np.zeros((L, 2, 1, 2), np.float32)
    w_in[0, 0, 0, 0] = 1.0     # filter <- old tap
    w_in[0, :, 0, 1] = 100.0   # gate ~ sigmoid(large) ~ 1
    w_in[1, 1, 0, 0] = 1.0     # layer 1 filter <- current tap
    w_in[1, :, 0, 1] = 100.0
    params["layers"]["w_in"] = jnp.asarray(w_in)
    params["layers"]["w_res"] = jnp.zeros((L, 1, 1))  # kill residual mixing
    params["layers"]["w_skip"] = jnp.ones((L, 1, 1))
    params["start"]["w"] = jnp.asarray(np.eye(4, 1, dtype=np.float32) * 1e-3)
    params["end1"]["w"] = jnp.ones((1, 1))
    params["end1"]["b"] = jnp.zeros((1,))
    params["end2"]["w"] = jnp.ones((1, 4))
    params["end2"]["b"] = jnp.zeros((1,))

    T = cfg.item_length  # rf=4 -> T=7
    # impulse at position p: class 0 embeds to 1e-3, others to 0
    x = jnp.full((1, T), 1, jnp.int32)
    h0 = embed_inputs(params, cfg, x)
    assert float(jnp.abs(h0).max()) == 0.0
    x = x.at[0, 2].set(0)
    y = wavenet_logits(params, cfg, x, out_len=T)  # all positions
    s = np.asarray(y[0, :, 0])
    # layer0 shifts the impulse by d=1, layer1 passes through current tap, so
    # the skip stream sees tanh activity at positions 2 (layer1 skip of its
    # own input? no: layer1 input is layer0 output) -> position 3 only.
    # Positions with zero skip give relu(0)*heads = end2 bias = 0.
    nz = np.nonzero(np.abs(s) > 1e-9)[0]
    assert 3 in nz
    assert all(i >= 2 for i in nz)
    assert all(i <= 3 for i in nz)


def test_kernel_size_3():
    """General kernel-size path (the reference supports kernel_size as a
    constructor arg, wavenet_model.py:37)."""
    cfg = wt.WaveNetConfig(
        layers=3, blocks=2, dilation_channels=8, residual_channels=8,
        skip_channels=8, end_channels=8, classes=16, output_length=4,
        kernel_size=3, bias=True,
    )
    assert cfg.receptive_field == 1 + 2 * 2 * 7
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    assert wt.parameter_count(params) == cfg.parameter_count()
    x = jax.random.randint(jax.random.PRNGKey(1), (2, cfg.item_length), 0, cfg.classes)
    y = wt.wavenet_logits(params, cfg, x)
    assert y.shape == (2, 4, 16)
    assert np.isfinite(np.asarray(y)).all()


def test_output_independent_of_extra_history(tiny):
    """Feeding a longer window must give the same last-output logits —
    the trunk is translation invariant and causal."""
    cfg, params = tiny
    T = cfg.item_length
    extra = 5
    x = jax.random.randint(jax.random.PRNGKey(4), (1, T + extra), 0, cfg.classes)
    y_full = wt.wavenet_logits(params, cfg, x, out_len=1)
    y_win = wt.wavenet_logits(params, cfg, x[:, extra:], out_len=1)
    np.testing.assert_allclose(
        np.asarray(y_full), np.asarray(y_win), atol=2e-3
    )


def test_bf16_residual_stream():
    """cfg.stream_dtype=bfloat16: logits stay within bf16 rounding of the
    f32 trunk, the config roundtrips, and f32 remains the exact default."""
    import jax.numpy as jnp
    from pytorch_wavenet_tpu.config import WaveNetConfig

    cfg = wt.get_config("tiny")
    params = wt.init_wavenet(jax.random.PRNGKey(0), cfg)
    x = jax.random.randint(jax.random.PRNGKey(1), (2, cfg.item_length), 0,
                           cfg.classes)
    y32 = np.asarray(wt.wavenet_logits(params, cfg, x))
    cfg16 = wt.get_config("tiny", stream_dtype=jnp.bfloat16)
    y16 = np.asarray(wt.wavenet_logits(params, cfg16, x))
    assert y16.dtype == np.float32  # head stays f32
    # bf16 has ~3 decimal digits; logits are O(1) at init
    np.testing.assert_allclose(y16, y32, atol=0.15, rtol=0.05)
    assert np.abs(y16 - y32).max() > 0  # the knob actually engaged

    cfg2 = WaveNetConfig.from_json(cfg16.to_json())
    assert cfg2 == cfg16 and cfg2.stream_dtype == jnp.bfloat16
    hash(cfg2)
