"""Worker process for the 2-process multi-host bring-up test.

Run as: python tests/multihost_worker.py <process_id> <num_processes> <port>

Each process owns 2 virtual CPU devices; ``init_distributed``
(parallel/mesh.py — the NCCL-init analog, SURVEY §2.3 collective-backend
row) joins them into one 4-device global mesh across the process group.
The worker then runs ONE sharded greedy decode step over the cross-process
(data=4) mesh and asserts token parity against its own local single-device
decode. Prints MULTIHOST_OK on success.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    proc_id, nprocs, port = (int(sys.argv[1]), int(sys.argv[2]),
                             int(sys.argv[3]))
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from index_tts_dubbing_tpu.engine import decode as decode_mod
    from index_tts_dubbing_tpu.models import gpt as jgpt
    from index_tts_dubbing_tpu.models.gpt import GPTConfig
    from index_tts_dubbing_tpu.parallel import mesh as mesh_lib

    # --- multi-host bring-up (the jax.distributed/NCCL-analog path)
    mesh_lib.init_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nprocs,
        process_id=proc_id)
    assert jax.process_count() == nprocs, jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == 2 * nprocs and n_local == 2, (n_global, n_local)

    # --- identical model/workload on every process (seeded)
    cfg = GPTConfig(model_dim=64, layers=2, heads=4, max_mel_tokens=40,
                    max_text_tokens=30, number_text_tokens=80,
                    cond_output_size=32, cond_linear_units=64,
                    cond_attention_heads=4, cond_num_blocks=2)
    params = jgpt.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    rows = [rng.integers(2, 80, size=n).astype(np.int32)
            for n in (5, 7, 6, 4)]
    conds = rng.standard_normal(
        (1, cfg.condition_num_latent, cfg.model_dim)).astype(np.float32)
    pre = decode_mod.prepare_prefix_host(cfg, rows, pad_to=8)
    emb, keep = decode_mod.build_prefix_emb(
        params, cfg, conds, pre["ids"], pre["pos"], pre["seg"],
        pre["cond_idx"])
    sc = decode_mod.SamplingConfig(do_sample=False, max_mel_tokens=12)
    key = jax.random.PRNGKey(0)

    # local single-device reference (every process computes the same one)
    ref = decode_mod.generate(params, cfg, sc, emb, keep, key)
    ref_codes = np.asarray(ref.codes)

    # cross-process (data=4) mesh decode: params replicated, batch sharded
    mesh = mesh_lib.make_mesh(data=n_global, model=1)
    specs = mesh_lib.gpt_param_specs(params, model_size=1)
    sharded = mesh_lib.shard_tree(params, specs, mesh)
    demb = jax.device_put(np.asarray(emb), NamedSharding(mesh, P("data")))
    dkeep = jax.device_put(np.asarray(keep), NamedSharding(mesh, P("data")))
    out = decode_mod.generate(sharded, cfg, sc, demb, dkeep, key, mesh=mesh)

    from jax.experimental import multihost_utils
    codes = np.asarray(multihost_utils.process_allgather(out.codes,
                                                         tiled=True))
    np.testing.assert_array_equal(codes, ref_codes)
    print(f"MULTIHOST_OK proc={proc_id} global_devices={n_global}",
          flush=True)


if __name__ == "__main__":
    main()
