"""ECAPA-TDNN parity vs the reference torch implementation with shared
random weights."""
import numpy as np
import pytest
import torch

from tests.ref_loader import load_reference


@pytest.fixture(scope="module")
def ref_model():
    load_reference()
    from indextts.BigVGAN.ECAPA_TDNN import ECAPA_TDNN
    torch.manual_seed(0)
    m = ECAPA_TDNN(100, lin_neurons=512)
    m.eval()
    return m


def test_ecapa_parity(ref_model, rng):
    from index_tts_dubbing_tpu.models import ecapa
    from index_tts_dubbing_tpu.utils.convert import convert_ecapa, torch_module_state_dict

    params = convert_ecapa(torch_module_state_dict(ref_model))
    mel = rng.standard_normal((2, 120, 100)).astype(np.float32)
    with torch.no_grad():
        ref = ref_model(torch.from_numpy(mel)).numpy()  # (B, 1, 512)
    got = np.asarray(ecapa.forward(params, mel))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-3)


def test_ecapa_init_shapes(rng):
    import jax
    from index_tts_dubbing_tpu.models import ecapa
    p = ecapa.init(jax.random.PRNGKey(0))
    mel = rng.standard_normal((1, 60, 100)).astype(np.float32)
    out = ecapa.forward(p, mel)
    assert out.shape == (1, 1, 512)
