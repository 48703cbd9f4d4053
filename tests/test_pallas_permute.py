"""Gen-cache permutation kernels (ops/pallas_permute.py): interpret-mode
correctness on CPU for the beam-reorder primitives (the real-TPU paths are
exercised by tools/profile_beam_step.py and were verified on-chip r03)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from index_tts_dubbing_tpu.ops import pallas_permute as pp

L, BN, H, G, D = 2, 6, 4, 32, 64


@pytest.fixture(scope="module")
def arrs():
    rng = np.random.default_rng(0)
    kg = jnp.asarray(rng.standard_normal((L, BN, H, G, D)).astype(np.float32))
    vg = kg + 1.0
    return kg, vg


def test_copy_on_fork_interpret(arrs):
    kg, vg = arrs
    cp = np.array([-1, 0, -1, 5, -1, -1], np.int32)  # row1<-row0, row3<-row5
    k2, v2 = pp.copy_on_fork(kg, vg, jnp.asarray(cp), jnp.int32(15), gb=8,
                             interpret=True)
    want = np.asarray(kg).copy()
    want[:, 1, :, :16, :] = want[:, 0, :, :16, :]
    want[:, 3, :, :16, :] = want[:, 5, :, :16, :]
    np.testing.assert_array_equal(np.asarray(k2), want)
    wantv = np.asarray(vg).copy()
    wantv[:, 1, :, :16, :] = wantv[:, 0, :, :16, :]
    wantv[:, 3, :, :16, :] = wantv[:, 5, :, :16, :]
    np.testing.assert_array_equal(np.asarray(v2), wantv)


def test_copy_on_fork_alignment_fallback(arrs):
    """When no G-block size satisfies the DMA lane alignment (gb=0), the op
    falls back to a dense XLA gather with FULL-row copies (bound ignored —
    slots past the bound are zero/permutation-invariant in real use)."""
    kg, vg = arrs
    kg5 = kg[:, :, :, :5, :]   # g_len=5: no divisor aligns
    vg5 = vg[:, :, :, :5, :]
    cp = np.array([-1, 0, -1, 5, -1, -1], np.int32)
    k2, _ = pp.copy_on_fork(kg5, vg5, jnp.asarray(cp), jnp.int32(2))
    want = np.asarray(kg5).copy()
    want[:, 1] = want[:, 0]
    want[:, 3] = want[:, 5]
    np.testing.assert_array_equal(np.asarray(k2), want)
