"""Mesh/TP sharding tests on the virtual 8-device CPU mesh: tensor-parallel
forward must equal the unsharded forward; training step runs under DP×TP."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from index_tts_dubbing_tpu.models import gpt as jgpt
from index_tts_dubbing_tpu.models.gpt import GPTConfig
from index_tts_dubbing_tpu.parallel import mesh as mesh_lib


@pytest.fixture(scope="module")
def small():
    cfg = GPTConfig(model_dim=64, layers=2, heads=4, max_mel_tokens=40,
                    max_text_tokens=30, number_text_tokens=80,
                    cond_output_size=32, cond_linear_units=64,
                    cond_attention_heads=4, cond_num_blocks=2)
    params = jgpt.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_devices_available():
    assert len(jax.devices()) == 8


def test_tp_forward_matches_unsharded(small, rng):
    cfg, params = small
    emb = rng.standard_normal((2, 24, 64)).astype(np.float32)
    ref = np.asarray(jgpt.trunk_forward(params, cfg, emb))

    mesh = mesh_lib.make_mesh(data=2, model=4)
    specs = mesh_lib.gpt_param_specs(params, model_size=4)
    sharded = mesh_lib.shard_tree(params, specs, mesh)
    demb = jax.device_put(emb, NamedSharding(mesh, P("data")))
    with mesh:
        out = np.asarray(jax.jit(
            lambda p, e: jgpt.trunk_forward(p, cfg, e))(sharded, demb))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_dp_tp_decode_matches_unsharded(small, rng):
    """The serving hot path: greedy AR decode under a (data=4, model=2) mesh
    must produce token-identical codes to the single-device decode."""
    from index_tts_dubbing_tpu.engine import decode as decode_mod

    cfg, params = small
    sc = decode_mod.SamplingConfig(do_sample=False, max_mel_tokens=12)
    rows = [rng.integers(2, 80, size=n).astype(np.int32)
            for n in (5, 7, 6, 4)]
    conds = jnp.asarray(
        rng.standard_normal((1, cfg.condition_num_latent, cfg.model_dim))
        .astype(np.float32))
    pre = decode_mod.prepare_prefix_host(cfg, rows, pad_to=8)
    emb, keep = decode_mod.build_prefix_emb(
        params, cfg, conds, pre["ids"], pre["pos"], pre["seg"],
        pre["cond_idx"])
    key = jax.random.PRNGKey(0)
    ref = decode_mod.generate(params, cfg, sc, emb, keep, key)

    mesh = mesh_lib.make_mesh(data=4, model=2)
    specs = mesh_lib.gpt_param_specs(params, model_size=2)
    sharded = mesh_lib.shard_tree(params, specs, mesh)
    demb = jax.device_put(emb, NamedSharding(mesh, P("data")))
    dkeep = jax.device_put(keep, NamedSharding(mesh, P("data")))
    out = decode_mod.generate(sharded, cfg, sc, demb, dkeep, key, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(out.codes),
                                  np.asarray(ref.codes))
    np.testing.assert_array_equal(np.asarray(out.lengths),
                                  np.asarray(ref.lengths))


@pytest.mark.parametrize("stochastic", [False, True])
def test_dp_tp_beam_decode_matches_unsharded(small, rng, stochastic):
    """The engine's quality default (num_beams=3): beam decode under a
    (data=4, model=2) mesh must be token-identical to single-device."""
    from index_tts_dubbing_tpu.engine import decode as decode_mod

    cfg, params = small
    sc = decode_mod.SamplingConfig(do_sample=stochastic, max_mel_tokens=12)
    rows = [rng.integers(2, 80, size=n).astype(np.int32)
            for n in (5, 7, 6, 4)]
    conds = jnp.asarray(
        rng.standard_normal((1, cfg.condition_num_latent, cfg.model_dim))
        .astype(np.float32))
    pre = decode_mod.prepare_prefix_host(cfg, rows, pad_to=8)
    emb, keep = decode_mod.build_prefix_emb(
        params, cfg, conds, pre["ids"], pre["pos"], pre["seg"],
        pre["cond_idx"])
    key = jax.random.PRNGKey(3)
    ref = decode_mod._beam_decode(params, cfg, sc, emb, keep, key, 3, 0.0,
                                  stochastic)

    mesh = mesh_lib.make_mesh(data=4, model=2)
    specs = mesh_lib.gpt_param_specs(params, model_size=2)
    sharded = mesh_lib.shard_tree(params, specs, mesh)
    demb = jax.device_put(emb, NamedSharding(mesh, P("data")))
    dkeep = jax.device_put(keep, NamedSharding(mesh, P("data")))
    out = decode_mod._beam_decode(sharded, cfg, sc, demb, dkeep, key, 3, 0.0,
                                  stochastic, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(out.codes),
                                  np.asarray(ref.codes))
    np.testing.assert_array_equal(np.asarray(out.lengths),
                                  np.asarray(ref.lengths))


def test_engine_mesh_infer_matches_unsharded(tmp_path):
    """Full-engine parity: IndexTTS under a DP×TP mesh, greedy decode, must
    produce the same waveform as the single-device engine."""
    from index_tts_dubbing_tpu.engine.tts import IndexTTS
    from tests.test_engine import small_config, _prompt_wav

    prompt = _prompt_wav(tmp_path)
    kw = dict(do_sample=False, max_mel_tokens=16, verbose=False)
    ref_eng = IndexTTS(config=small_config(), verbose_init=False)
    sr_ref, wav_ref = ref_eng.infer(str(prompt), "hello world", None, **kw)

    mesh = mesh_lib.make_mesh(data=4, model=2)
    eng = IndexTTS(config=small_config(), verbose_init=False, mesh=mesh)
    sr, wav = eng.infer(str(prompt), "hello world", None, **kw)
    assert sr == sr_ref
    np.testing.assert_allclose(wav.astype(np.float32),
                               wav_ref.astype(np.float32), atol=2.0)


def test_dryrun_entrypoints():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_data_sharding_helpers(small):
    cfg, params = small
    mesh = mesh_lib.make_mesh(data=4, model=2)
    x = np.zeros((8, 4), np.float32)
    d = jax.device_put(x, mesh_lib.data_sharding(mesh))
    assert d.sharding.spec == P("data")
    r = mesh_lib.replicate(mesh, {"a": x})
    assert r["a"].sharding.spec == P()
