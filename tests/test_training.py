"""Training subsystem tests: GPT train step convergence-smoke, checkpoint
save/resume roundtrip, vocoder losses finite."""
import jax
import numpy as np
import pytest

from index_tts_dubbing_tpu.models import gpt as jgpt
from index_tts_dubbing_tpu.models.gpt import GPTConfig
from index_tts_dubbing_tpu.training import step as train_mod


@pytest.fixture(scope="module")
def setup():
    cfg = GPTConfig(model_dim=64, layers=2, heads=4, max_mel_tokens=40,
                    max_text_tokens=30, number_text_tokens=80,
                    cond_output_size=32, cond_linear_units=64,
                    cond_attention_heads=4, cond_num_blocks=2)
    params = jgpt.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b = 2
    batch = {
        "cond_mel": rng.standard_normal((b, 40, 100)).astype(np.float32),
        "cond_lens": np.full((b,), 40, np.int64),
        "text_ids": rng.integers(2, 80, size=(b, 10)).astype(np.int32),
        "text_lens": np.full((b,), 10, np.int64),
        "codes": rng.integers(0, 8192, size=(b, 12)).astype(np.int32),
        "code_lens": np.full((b,), 10, np.int64),
    }
    return cfg, params, batch


def test_train_step_reduces_loss(setup):
    cfg, params, batch = setup
    tx = train_mod.make_optimizer(lr=1e-3, warmup=1)
    state = train_mod.init_state(params, tx)
    losses = []
    for _ in range(5):
        state, metrics = train_mod.train_step(state, batch, cfg, tx)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_checkpoint_roundtrip(setup, tmp_path):
    cfg, params, batch = setup
    tx = train_mod.make_optimizer(lr=1e-3, warmup=1)
    state = train_mod.init_state(params, tx)
    state, _ = train_mod.train_step(state, batch, cfg, tx)
    path = tmp_path / "state.npz"
    train_mod.save_state(str(path), state)
    restored = train_mod.load_state(str(path), tx, state)
    assert int(restored.step) == int(state.step)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # resumed state steps further without error
    restored2, m = train_mod.train_step(restored, batch, cfg, tx)
    assert np.isfinite(float(m["loss"]))


def test_vocoder_losses_finite(rng):
    from index_tts_dubbing_tpu.models import bigvgan_disc as disc
    from index_tts_dubbing_tpu.training import vocoder_losses as vl
    mpd = disc.init_mpd(jax.random.PRNGKey(0))
    mrd = disc.init_mrd(jax.random.PRNGKey(1))
    banks = vl.make_mel_banks()
    y = rng.standard_normal((1, 16384)).astype(np.float32) * 0.2
    yh = rng.standard_normal((1, 16384)).astype(np.float32) * 0.2
    g, gm = vl.generator_total_loss(mpd, mrd, banks, y, yh)
    d, dm = vl.discriminator_total_loss(mpd, mrd, y, yh)
    assert np.isfinite(float(g)) and np.isfinite(float(d))
    assert set(gm) == {"adv_mpd", "adv_mrd", "feature", "mel"}
