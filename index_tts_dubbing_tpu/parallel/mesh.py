"""Device meshes and sharding rules.

TPU-native replacement for the reference's (vestigial) parallelism: instead of
HF device maps / DeepSpeed / NCCL (SURVEY §2.3), scaling is expressed as a
``jax.sharding.Mesh`` with named axes:

- ``data``  — batch axis (utterances / SRT segments). The primary scaling
  axis for inference serving.
- ``model`` — tensor-parallel axis: GPT attention heads + FFN hidden dim are
  sharded; XLA inserts all-reduces over ICI automatically.

``jax.distributed.initialize`` (multi-host) composes transparently: build the
mesh from ``jax.devices()`` and the same annotations ride DCN across hosts.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host process-group bring-up (the NCCL-init analog)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


# ---------------------------------------------------------------------------
# GPT tensor-parallel sharding rules
# ---------------------------------------------------------------------------

def gpt_param_specs(params: Dict[str, Any], model_size: int = 1) -> Dict[str, Any]:
    """PartitionSpec tree for models/gpt.py params: megatron-style TP.

    qkv/fc shard the output dim, proj shards the input dim → one psum per
    block, inserted by XLA from these annotations alone. Dims not divisible
    by the ``model`` axis size fall back to replication (e.g. the 12001-wide
    text head).
    """
    def replicated(tree):
        return jax.tree.map(lambda _: P(), tree)

    def ok(p, *path):
        node = params
        for k in path:
            node = node[k]
        return all(node.shape[i] % model_size == 0
                   for i, ax in enumerate(p) if ax == "model")

    def maybe(p, *path):
        return p if ok(p, *path) else P()

    specs = replicated(params)
    for li, blk in enumerate(specs["blocks"]):
        pb = ("blocks", li)
        blk["attn"]["qkv"] = {
            "w": maybe(P(None, "model"), *pb, "attn", "qkv", "w"),
            "b": maybe(P("model"), *pb, "attn", "qkv", "b")}
        blk["attn"]["proj"] = {
            "w": maybe(P("model", None), *pb, "attn", "proj", "w"), "b": P()}
        blk["mlp"]["fc"] = {
            "w": maybe(P(None, "model"), *pb, "mlp", "fc", "w"),
            "b": maybe(P("model"), *pb, "mlp", "fc", "b")}
        blk["mlp"]["proj"] = {
            "w": maybe(P("model", None), *pb, "mlp", "proj", "w"), "b": P()}
    # output heads shard the vocab dim where divisible
    specs["mel_head"] = {
        "w": maybe(P(None, "model"), "mel_head", "w"),
        "b": maybe(P("model"), "mel_head", "b")}
    specs["text_head"] = {
        "w": maybe(P(None, "model"), "text_head", "w"),
        "b": maybe(P("model"), "text_head", "b")}
    return specs


def bigvgan_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """The vocoder is small and bandwidth-bound → replicate; scale via the
    data axis."""
    return jax.tree.map(lambda _: P(), params)


def shard_tree(tree: Dict[str, Any], specs: Dict[str, Any],
               mesh: Mesh) -> Dict[str, Any]:
    """Device-put a param tree with the given PartitionSpec tree."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)


def data_sharding(mesh: Mesh, *batch_axes) -> NamedSharding:
    return NamedSharding(mesh, P("data", *batch_axes))


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
