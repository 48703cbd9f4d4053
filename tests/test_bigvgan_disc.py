"""Discriminator + GAN-loss parity vs the reference (random weights)."""
import numpy as np
import pytest
import torch

from tests.ref_loader import load_reference


class H(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


@pytest.fixture(scope="module")
def refs():
    load_reference()
    from indextts.BigVGAN import models as ref_models
    return ref_models


def _to_j_conv2d(sd, prefix):
    from index_tts_dubbing_tpu.utils.convert import conv2d_w, fold_weight_norm
    return {"w": conv2d_w(fold_weight_norm(sd, prefix)),
            "b": sd[f"{prefix}.bias"]}


def test_disc_p_parity(refs, rng):
    from index_tts_dubbing_tpu.models import bigvgan_disc as jd
    from index_tts_dubbing_tpu.utils.convert import torch_module_state_dict
    torch.manual_seed(11)
    h = H(discriminator_channel_mult=1)
    ref = refs.DiscriminatorP(h, period=3)
    ref.eval()
    sd = torch_module_state_dict(ref)
    p = {"convs": [_to_j_conv2d(sd, f"convs.{i}") for i in range(5)],
         "post": _to_j_conv2d(sd, "conv_post")}
    wav = rng.standard_normal((2, 4410)).astype(np.float32)
    with torch.no_grad():
        score_t, fmap_t = ref(torch.from_numpy(wav)[:, None, :])
    score_j, fmap_j = jd.disc_p_forward(p, wav, 3)
    np.testing.assert_allclose(np.asarray(score_j), score_t.numpy(),
                               atol=1e-4, rtol=1e-3)
    assert len(fmap_j) == len(fmap_t)


def test_disc_r_parity(refs, rng):
    from index_tts_dubbing_tpu.models import bigvgan_disc as jd
    from index_tts_dubbing_tpu.utils.convert import torch_module_state_dict
    torch.manual_seed(12)
    cfg = H(use_spectral_norm=False, discriminator_channel_mult=1)
    res = [1024, 120, 600]
    ref = refs.DiscriminatorR(cfg, res)
    ref.eval()
    sd = torch_module_state_dict(ref)
    p = {"convs": [_to_j_conv2d(sd, f"convs.{i}") for i in range(5)],
         "post": _to_j_conv2d(sd, "conv_post")}
    wav = rng.standard_normal((2, 9600)).astype(np.float32) * 0.3
    with torch.no_grad():
        score_t, _ = ref(torch.from_numpy(wav)[:, None, :])
    score_j, _ = jd.disc_r_forward(p, wav, res)
    np.testing.assert_allclose(np.asarray(score_j), score_t.numpy(),
                               atol=2e-3, rtol=1e-2)


def test_gan_losses_parity(refs, rng):
    from index_tts_dubbing_tpu.models import bigvgan_disc as jd
    r = [rng.standard_normal((2, 10)).astype(np.float32) for _ in range(3)]
    g = [rng.standard_normal((2, 10)).astype(np.float32) for _ in range(3)]
    loss_t, rt, gt = refs.discriminator_loss(
        [torch.from_numpy(x) for x in r], [torch.from_numpy(x) for x in g])
    loss_j, rj, gj = jd.discriminator_loss(r, g)
    np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=1e-5)
    gl_t, _ = refs.generator_loss([torch.from_numpy(x) for x in g])
    gl_j, _ = jd.generator_loss(g)
    np.testing.assert_allclose(float(gl_j), gl_t.item(), rtol=1e-5)
    fr = [[rng.standard_normal((2, 4, 4)).astype(np.float32)] for _ in range(2)]
    fg = [[rng.standard_normal((2, 4, 4)).astype(np.float32)] for _ in range(2)]
    fl_t = refs.feature_loss([[torch.from_numpy(a) for a in b] for b in fr],
                             [[torch.from_numpy(a) for a in b] for b in fg])
    fl_j = jd.feature_loss(fr, fg)
    np.testing.assert_allclose(float(fl_j), fl_t.item(), rtol=1e-5)
