"""Continuous batching decoder: row-for-row parity with engine.decode.generate
and slot-refill behaviour when the queue exceeds the slot count."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from index_tts_dubbing_tpu.engine import continuous as cb
from index_tts_dubbing_tpu.engine import decode as decode_mod
from index_tts_dubbing_tpu.engine.decode import SamplingConfig
from index_tts_dubbing_tpu.models import gpt as gpt_model
from index_tts_dubbing_tpu.models.gpt import GPTConfig


CFG = GPTConfig(model_dim=64, layers=2, heads=4, max_mel_tokens=24,
                max_text_tokens=40, number_text_tokens=50,
                number_mel_codes=70, start_mel_token=68, stop_mel_token=69,
                cond_output_size=32, cond_linear_units=64,
                cond_attention_heads=4, cond_num_blocks=1)
SC = SamplingConfig(do_sample=False, max_mel_tokens=16,
                    repetition_penalty=3.0)


@pytest.fixture(scope="module")
def setup():
    params = gpt_model.init(jax.random.PRNGKey(0), CFG)
    params = jax.tree.map(jnp.asarray, params)
    conds = jax.random.normal(jax.random.PRNGKey(1),
                              (1, CFG.condition_num_latent, CFG.model_dim))
    return params, conds


def _reference_rows(params, conds, rows, buckets=(8, 16)):
    """Greedy per-row decode via the uniform-batch generate()."""
    out = []
    for r in rows:
        pad_to = next((b for b in buckets if b >= r.size), r.size)
        pre = decode_mod.prepare_prefix_host(CFG, [r], pad_to=pad_to)
        emb, keep = decode_mod.build_prefix_emb(
            params, CFG, conds, jnp.asarray(pre["ids"]),
            jnp.asarray(pre["pos"]), jnp.asarray(pre["seg"]),
            jnp.asarray(pre["cond_idx"]))
        res = decode_mod.generate(params, CFG, SC, emb, keep,
                                  jax.random.PRNGKey(7))
        out.append((np.asarray(res.codes)[0], int(np.asarray(res.lengths)[0])))
    return out


def test_greedy_parity_and_refill(setup):
    params, conds = setup
    rng = np.random.default_rng(3)
    # 5 requests, 2 slots: forces at least 3 refills
    rows = [rng.integers(2, 50, size=n).astype(np.int32)
            for n in (5, 11, 7, 15, 4)]
    ref = _reference_rows(params, conds, rows)

    batcher = cb.ContinuousBatcher(params, CFG, SC, conds, batch=2, chunk=4,
                                   text_buckets=(8, 16))
    results = batcher.run([cb.CBRequest(uid=i, text_ids=r)
                           for i, r in enumerate(rows)])
    assert set(results) == set(range(len(rows)))
    for i, (ref_codes, ref_len) in enumerate(ref):
        got_codes, got_len = results[i]
        assert got_len == ref_len, f"row {i}: len {got_len} != {ref_len}"
        np.testing.assert_array_equal(got_codes[:got_len],
                                      ref_codes[:ref_len])


def test_single_slot_serialises(setup):
    params, conds = setup
    rng = np.random.default_rng(5)
    rows = [rng.integers(2, 50, size=n).astype(np.int32) for n in (6, 9)]
    ref = _reference_rows(params, conds, rows)
    batcher = cb.ContinuousBatcher(params, CFG, SC, conds, batch=1, chunk=32,
                                   text_buckets=(8, 16))
    results = batcher.run([cb.CBRequest(uid=i, text_ids=r)
                           for i, r in enumerate(rows)])
    for i, (ref_codes, ref_len) in enumerate(ref):
        got_codes, got_len = results[i]
        assert got_len == ref_len
        np.testing.assert_array_equal(got_codes[:got_len],
                                      ref_codes[:ref_len])
