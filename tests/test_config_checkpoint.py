"""Config loader (reference YAML schema) and checkpoint tree IO tests."""
import numpy as np
import pytest

from index_tts_dubbing_tpu.utils.checkpoint import (flatten_tree, load_params,
                                                    save_params,
                                                    unflatten_tree)
from index_tts_dubbing_tpu.utils.config import load_config


def test_load_reference_config():
    cfg = load_config("/root/reference/checkpoints/config.yaml")
    g = cfg.gpt
    assert (g.model_dim, g.layers, g.heads) == (1024, 20, 16)
    assert g.max_mel_tokens == 605 and g.max_text_tokens == 402
    assert g.number_mel_codes == 8194
    assert g.condition_type == "conformer_perceiver"
    assert g.cond_output_size == 512 and g.cond_num_blocks == 6
    b = cfg.bigvgan
    assert tuple(b.upsample_rates) == (4, 4, 4, 4, 2, 2)
    assert b.upsample_initial_channel == 1536
    assert b.activation == "snakebeta" and b.snake_logscale
    assert b.cond_in_each_up_layer
    assert cfg.mel.sample_rate == 24000 and cfg.mel.n_mels == 100
    assert cfg.bpe_model == "bpe.model"


def test_tree_roundtrip(tmp_path, rng):
    tree = {
        "a": {"w": rng.standard_normal((3, 4)).astype(np.float32)},
        "blocks": [{"x": np.ones(2)}, {"x": np.zeros(2)}],
        "scalar": np.float32(2.5),
    }
    flat = flatten_tree(tree)
    assert set(flat) == {"a/w", "blocks/0/x", "blocks/1/x", "scalar"}
    back = unflatten_tree(flat)
    assert isinstance(back["blocks"], list) and len(back["blocks"]) == 2
    p = tmp_path / "t.npz"
    save_params(p, tree)
    loaded = load_params(p)
    np.testing.assert_array_equal(loaded["a"]["w"], tree["a"]["w"])
    np.testing.assert_array_equal(loaded["blocks"][1]["x"], np.zeros(2))
