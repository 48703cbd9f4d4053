"""Parity of the anti-aliased snake path vs the reference torch implementation
(BigVGAN/alias_free_torch)."""
import numpy as np
import pytest
import torch

from tests.ref_loader import load_reference


@pytest.fixture(scope="module")
def ref():
    load_reference()
    from indextts.BigVGAN.alias_free_torch import resample, act  # noqa
    import indextts.BigVGAN.activations as activations
    return resample, act, activations


def test_filter_matches(ref):
    from index_tts_dubbing_tpu.ops.alias_free import kaiser_sinc_filter1d
    resample, _, _ = ref
    from indextts.BigVGAN.alias_free_torch.filter import kaiser_sinc_filter1d as t_filt
    ours = kaiser_sinc_filter1d(0.25, 0.3, 12)
    theirs = t_filt(0.25, 0.3, 12).numpy().reshape(-1)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_upsample_downsample(ref, rng):
    from index_tts_dubbing_tpu.ops.alias_free import upsample2, downsample2
    resample, _, _ = ref
    x = rng.standard_normal((2, 64, 8)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 2, 1))  # torch is (B, C, T)

    up_t = resample.UpSample1d(2)(xt).numpy().transpose(0, 2, 1)
    up_j = np.asarray(upsample2(x))
    assert up_j.shape == up_t.shape
    np.testing.assert_allclose(up_j, up_t, atol=1e-5)

    dn_t = resample.DownSample1d(2)(xt).numpy().transpose(0, 2, 1)
    dn_j = np.asarray(downsample2(x))
    assert dn_j.shape == dn_t.shape
    np.testing.assert_allclose(dn_j, dn_t, atol=1e-5)


@pytest.mark.parametrize("logscale", [True, False])
def test_snakebeta_activation1d(ref, rng, logscale):
    from index_tts_dubbing_tpu.ops.alias_free import anti_aliased_activation
    resample, act, activations = ref
    C = 16
    x = rng.standard_normal((2, 96, C)).astype(np.float32)
    alpha = rng.standard_normal(C).astype(np.float32) * 0.3
    beta = rng.standard_normal(C).astype(np.float32) * 0.3

    sb = activations.SnakeBeta(C, alpha_logscale=logscale)
    with torch.no_grad():
        sb.alpha.copy_(torch.from_numpy(alpha))
        sb.beta.copy_(torch.from_numpy(beta))
    a1 = act.Activation1d(activation=sb)
    xt = torch.from_numpy(x.transpose(0, 2, 1))
    with torch.no_grad():
        y_t = a1(xt).numpy().transpose(0, 2, 1)

    y_j = np.asarray(anti_aliased_activation(x, alpha, beta, logscale))
    assert y_j.shape == y_t.shape
    np.testing.assert_allclose(y_j, y_t, atol=2e-5)
