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
