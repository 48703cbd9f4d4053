"""Fused whole-resblock Pallas kernel vs the XLA C-major pair chain
(interpret mode on CPU). Mirrors tests/test_pallas_snake.py."""
import numpy as np
import pytest

import jax.numpy as jnp

from index_tts_dubbing_tpu.engine import vocoder as voc
from index_tts_dubbing_tpu.ops import alias_free


class _Cfg:
    activation = "snakebeta"
    snake_logscale = True


def _mk_resblock(rng, c, k, npair=3):
    rb = {"convs1": [], "convs2": [], "acts": []}
    for _ in range(npair):
        rb["convs1"].append({
            "w": (rng.standard_normal((k, c, c)) * 0.1).astype(np.float32),
            "b": (rng.standard_normal(c) * 0.1).astype(np.float32)})
        rb["convs2"].append({
            "w": (rng.standard_normal((k, c, c)) * 0.1).astype(np.float32),
            "b": (rng.standard_normal(c) * 0.1).astype(np.float32)})
    for _ in range(2 * npair):
        rb["acts"].append({
            "alpha": (rng.standard_normal(c) * 0.3).astype(np.float32),
            "beta": (rng.standard_normal(c) * 0.3).astype(np.float32)})
    return rb


def _xla_resblock(cfg, rb, x, k, dils):
    """The resblock loop of _vocode_window_cmajor (XLA, no Pallas)."""
    y = x
    acts1, acts2 = rb["acts"][::2], rb["acts"][1::2]
    for c1, c2, a1, a2, d in zip(rb["convs1"], rb["convs2"], acts1, acts2,
                                 dils):
        yt = alias_free.anti_aliased_activation_cmajor(
            y, a1["alpha"], a1["beta"], cfg.snake_logscale, use_pallas=False)
        yt = voc._conv1d_cm(c1, yt, dilation=d, padding=(k * d - d) // 2)
        yt = alias_free.anti_aliased_activation_cmajor(
            yt, a2["alpha"], a2["beta"], cfg.snake_logscale, use_pallas=False)
        yt = voc._conv1d_cm(c2, yt, padding=(k - 1) // 2)
        y = yt + y
    return y


@pytest.mark.parametrize("k,dils", [(3, (1, 3, 5)), (11, (1, 3, 5))])
@pytest.mark.parametrize("t", [256, 300])  # 300: t_pad cropping (128∤300)
def test_fused_resblock_matches_xla_interior(rng, k, dils, t):
    import jax
    from unittest import mock
    from jax.experimental import pallas as pl

    from index_tts_dubbing_tpu.ops import pallas_resblock

    c = 24
    cfg = _Cfg()
    rb = _mk_resblock(rng, c, k)
    x = (rng.standard_normal((2, c, t)) * 0.5).astype(np.float32)

    ref = np.asarray(_xla_resblock(cfg, rb, jnp.asarray(x), k, dils))

    w1, b1, w2, b2, acts = pallas_resblock.pack_resblock(rb, cfg, jnp.float32)
    orig_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    with mock.patch.object(pallas_resblock.pl, "pallas_call", interp_call):
        got = np.asarray(pallas_resblock.fused_resblock_cmajor(
            jnp.asarray(x), w1, b1, w2, b2, acts, k, dils))

    assert got.shape == ref.shape
    s = pallas_resblock.chain_shrink(k, dils) + 2
    np.testing.assert_allclose(got[:, :, s:-s], ref[:, :, s:-s],
                               atol=3e-4, rtol=1e-4)
    # boundary columns differ (replicate-x vs per-op padding semantics,
    # amplified by random ~N(0,.1) conv chains) but must stay finite
    assert np.all(np.isfinite(got))


def test_chain_shrink_values():
    from index_tts_dubbing_tpu.ops.pallas_resblock import chain_shrink
    assert chain_shrink(3, (1, 3, 5)) == 48
    assert chain_shrink(7, (1, 3, 5)) == 72
    assert chain_shrink(11, (1, 3, 5)) == 96


def test_fused_window_driver_matches_xla(rng):
    """WindowedVocoder(cmajor, fuse_resblocks=True, interpret) vs the plain
    cmajor XLA window path over a multi-window stream."""
    import jax
    from unittest import mock
    from jax.experimental import pallas as pl

    from index_tts_dubbing_tpu.engine.vocoder import WindowedVocoder
    from index_tts_dubbing_tpu.models import bigvgan
    from index_tts_dubbing_tpu.ops import pallas_resblock

    cfg = bigvgan.BigVGANConfig(upsample_initial_channel=128, gpt_dim=16)
    params = bigvgan.init(jax.random.PRNGKey(7), cfg)
    latent = rng.standard_normal((57, 16)).astype(np.float32) * 0.3
    mel_ref = rng.standard_normal((1, 50, 100)).astype(np.float32)

    a = WindowedVocoder(params, cfg, window=16, halo=16, layout="cmajor",
                        use_pallas=False, fuse_resblocks=False)(latent, mel_ref)

    orig_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    with mock.patch.object(pallas_resblock.pl, "pallas_call", interp_call):
        b = WindowedVocoder(params, cfg, window=16, halo=16, layout="cmajor",
                            use_pallas=False, fuse_resblocks=True)(latent,
                                                                   mel_ref)
    assert a.shape == b.shape
    # interiors agree; window/sequence edges carry the replicate-vs-zero-pad
    # approximation (same class as the Pallas act kernel, decaying tails)
    n = a.size
    np.testing.assert_allclose(a[n // 8: -n // 8], b[n // 8: -n // 8],
                               atol=3e-4)


def test_edge_exact_routing_matches_exact_path(rng):
    """With edge_exact (the TPU default), the production fused path must
    match the exact zero-pad-conv path EVERYWHERE — including the stream
    boundaries the fused kernels otherwise approximate (VERDICT r02 weak #5;
    spec: alias_free_torch/filter.py:29-95 boundary behavior)."""
    import jax
    from unittest import mock
    from jax.experimental import pallas as pl

    from index_tts_dubbing_tpu.engine.vocoder import WindowedVocoder
    from index_tts_dubbing_tpu.models import bigvgan
    from index_tts_dubbing_tpu.ops import pallas_resblock

    cfg = bigvgan.BigVGANConfig(upsample_initial_channel=128, gpt_dim=16)
    params = bigvgan.init(jax.random.PRNGKey(7), cfg)
    latent = rng.standard_normal((57, 16)).astype(np.float32) * 0.3
    mel_ref = rng.standard_normal((1, 50, 100)).astype(np.float32)

    exact = WindowedVocoder(params, cfg, window=16, halo=16, layout="cmajor",
                            use_pallas=False, fuse_resblocks=False
                            )(latent, mel_ref)

    orig_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    with mock.patch.object(pallas_resblock.pl, "pallas_call", interp_call):
        voc = WindowedVocoder(params, cfg, window=16, halo=16,
                              layout="cmajor", use_pallas=False,
                              fuse_resblocks=True, edge_exact=True)
        assert voc.edge_exact
        got = voc(latent, mel_ref)
    # FULL-length comparison: boundaries must now agree too
    np.testing.assert_allclose(got, exact, atol=3e-4)
