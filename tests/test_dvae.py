"""DVAE parity vs the reference DiscreteVAE (IndexTTS config, shared random
weights): codebook indices and decode path."""
import numpy as np
import pytest
import torch

from tests.ref_loader import load_reference


@pytest.fixture(scope="module")
def ref_dvae():
    load_reference()
    from indextts.vqvae.xtts_dvae import DiscreteVAE
    torch.manual_seed(5)
    m = DiscreteVAE(channels=100, num_tokens=512, hidden_dim=64,
                    num_resnet_blocks=3, codebook_dim=64, num_layers=2,
                    positional_dims=1, kernel_size=3, smooth_l1_loss=True,
                    use_transposed_convs=False)
    m.eval()
    return m


def _convert(ref, cfg):
    """Production converter applied to an in-memory reference module."""
    from index_tts_dubbing_tpu.utils.convert import (
        convert_dvae, torch_module_state_dict)
    return convert_dvae(torch_module_state_dict(ref),
                        num_layers=cfg.num_layers,
                        num_resnet_blocks=cfg.num_resnet_blocks)


def test_dvae_parity(ref_dvae, rng):
    from index_tts_dubbing_tpu.models import dvae as jdvae
    cfg = jdvae.DVAEConfig(channels=100, num_tokens=512, hidden_dim=64,
                           num_resnet_blocks=3, codebook_dim=64, num_layers=2)
    params = _convert(ref_dvae, cfg)
    mel = rng.standard_normal((2, 100, 32)).astype(np.float32)
    with torch.no_grad():
        ref_codes = ref_dvae.get_codebook_indices(
            torch.from_numpy(mel)).numpy()
        ref_mel, _ = ref_dvae.decode(torch.from_numpy(ref_codes.astype(np.int64)))
    codes = np.asarray(jdvae.get_codebook_indices(
        params, cfg, mel.transpose(0, 2, 1)))
    np.testing.assert_array_equal(codes, ref_codes)
    dec = np.asarray(jdvae.decode(params, cfg, codes)).transpose(0, 2, 1)
    np.testing.assert_allclose(dec, ref_mel.numpy(), atol=2e-5)


def test_dvae_convert_npz_roundtrip(ref_dvae, rng, tmp_path):
    """convert_dvae output survives an npz save/load roundtrip and still
    matches the reference codes (the tools/convert_checkpoints.py path)."""
    from index_tts_dubbing_tpu.models import dvae as jdvae
    from index_tts_dubbing_tpu.utils.checkpoint import (load_params,
                                                        save_params)
    cfg = jdvae.DVAEConfig(channels=100, num_tokens=512, hidden_dim=64,
                           num_resnet_blocks=3, codebook_dim=64, num_layers=2)
    params = _convert(ref_dvae, cfg)
    save_params(tmp_path / "dvae.npz", params)
    loaded = load_params(tmp_path / "dvae.npz")
    mel = rng.standard_normal((1, 100, 16)).astype(np.float32)
    with torch.no_grad():
        ref_codes = ref_dvae.get_codebook_indices(
            torch.from_numpy(mel)).numpy()
    codes = np.asarray(jdvae.get_codebook_indices(
        loaded, cfg, mel.transpose(0, 2, 1)))
    np.testing.assert_array_equal(codes, ref_codes)


def test_dvae_train_loss(rng):
    import jax
    from index_tts_dubbing_tpu.models import dvae as jdvae
    cfg = jdvae.DVAEConfig(channels=100, num_tokens=128, hidden_dim=32,
                           num_resnet_blocks=1, codebook_dim=32, num_layers=2)
    params = jdvae.init(jax.random.PRNGKey(0), cfg)
    mel = rng.standard_normal((2, 16, 100)).astype(np.float32)
    recon_loss, commit, recon = jdvae.forward_train(params, cfg, mel)
    assert np.isfinite(float(recon_loss)) and np.isfinite(float(commit))
    assert recon.shape == mel.shape
    # EMA update runs and keeps shapes
    logits = jdvae.encode(params, cfg, mel)
    _, codes, _ = jdvae.quantize(params, logits)
    state = jdvae.EMAState(np.zeros(cfg.num_tokens, np.float32),
                           np.asarray(params["codebook"]["embed"]))
    new_params, new_state = jdvae.ema_update(params, state, logits, codes)
    assert new_params["codebook"]["embed"].shape == \
        params["codebook"]["embed"].shape
