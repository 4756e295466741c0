"""Config system tests (the reference has no config layer — SURVEY.md §5
flags this as a gap to fill)."""

import jax.numpy as jnp
import pytest

import pytorch_wavenet_tpu as wt


def test_presets_exist():
    for name in ("chaconne", "saber", "test_small", "tiny"):
        cfg = wt.get_config(name)
        assert cfg.receptive_field > 0


def test_chaconne_matches_reference_train_script():
    # reference: train_script.py:17-25
    cfg = wt.get_config("chaconne")
    assert (cfg.layers, cfg.blocks) == (10, 3)
    assert cfg.skip_channels == 1024 and cfg.end_channels == 512
    assert cfg.output_length == 16 and cfg.bias


def test_dilation_schedule():
    cfg = wt.WaveNetConfig(layers=3, blocks=2)
    # doubles per layer, resets per block (reference: wavenet_model.py:70-109)
    assert cfg.dilations == (1, 2, 4, 1, 2, 4)
    assert cfg.max_dilation == 4


def test_json_roundtrip():
    cfg = wt.get_config("tiny", compute_dtype=jnp.bfloat16)
    cfg2 = wt.WaveNetConfig.from_json(cfg.to_json())
    assert cfg2 == cfg


def test_overrides():
    cfg = wt.get_config("tiny", output_length=9)
    assert cfg.output_length == 9
    with pytest.raises(KeyError):
        wt.get_config("nope")


def test_config_hashable_for_jit():
    d = {wt.get_config("tiny"): 1}
    assert d[wt.get_config("tiny")] == 1
