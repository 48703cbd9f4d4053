"""Pallas fused anti-alias snake vs the XLA path (interpret mode on CPU)."""
import numpy as np
import pytest

from index_tts_dubbing_tpu.ops import alias_free


@pytest.mark.parametrize("logscale", [True, False])
def test_pallas_matches_xla_interior(rng, logscale):
    import jax
    from unittest import mock
    from jax.experimental import pallas as pl

    from index_tts_dubbing_tpu.ops import pallas_snake

    c, t = 24, 64
    x = rng.standard_normal((2, t, c)).astype(np.float32)
    alpha = (rng.standard_normal(c) * 0.3).astype(np.float32)
    beta = (rng.standard_normal(c) * 0.3).astype(np.float32)

    ref = np.asarray(alias_free.anti_aliased_activation(x, alpha, beta,
                                                        logscale))

    orig_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    with mock.patch.object(pallas_snake.pl, "pallas_call", interp_call):
        got = np.asarray(pallas_snake.fused_anti_alias_snake(
            x, alpha, beta, logscale))

    assert got.shape == ref.shape
    # edges (±3 frames of true boundaries) use recompute-over-replicate
    # semantics; interior must match exactly
    np.testing.assert_allclose(got[:, 4:-4, :], ref[:, 4:-4, :], atol=2e-5)
    # edges still close (bounded deviation)
    np.testing.assert_allclose(got, ref, atol=0.2)


@pytest.mark.parametrize("t", [64, 200])  # 200: t_pad cropping (128∤200)
@pytest.mark.parametrize("logscale", [True, False])
def test_pallas_cmajor_matches_xla_interior(rng, logscale, t):
    """C-major (time-in-lanes) kernel vs XLA, interpret mode. Mirrors the
    row-major test; t=200 exercises the t_pad crop in
    fused_anti_alias_snake_cmajor."""
    from unittest import mock
    from jax.experimental import pallas as pl

    from index_tts_dubbing_tpu.ops import pallas_snake

    c = 24
    x = rng.standard_normal((2, c, t)).astype(np.float32)
    alpha = (rng.standard_normal(c) * 0.3).astype(np.float32)
    beta = (rng.standard_normal(c) * 0.3).astype(np.float32)

    ref = np.asarray(alias_free.anti_aliased_activation_cmajor(
        x, alpha, beta, logscale, use_pallas=False))

    orig_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    with mock.patch.object(pallas_snake.pl, "pallas_call", interp_call):
        got = np.asarray(pallas_snake.fused_anti_alias_snake_cmajor(
            x, alpha, beta, logscale))

    assert got.shape == ref.shape
    np.testing.assert_allclose(got[:, :, 4:-4], ref[:, :, 4:-4], atol=2e-5)
    np.testing.assert_allclose(got, ref, atol=0.2)


def test_pick_tile_cmajor_minimises_pad():
    from index_tts_dubbing_tpu.ops.pallas_snake import _pick_tile_cmajor

    # production stage T=5120 must pad nothing (was 6144 with fixed tt=2048)
    ct, tt = _pick_tile_cmajor(5120, 192)
    assert (-(-5120 // tt) * tt) == 5120
    ct, tt = _pick_tile_cmajor(20480, 96)
    assert (-(-20480 // tt) * tt) == 20480
    # small stage: one block, bounded pad
    ct, tt = _pick_tile_cmajor(320, 768)
    assert (-(-320 // tt) * tt) - 320 < 128
