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

    def ok(node, p):
        return all(node.shape[i] % model_size == 0
                   for i, ax in enumerate(p) if ax == "model")

    def maybe(node, p):
        return p if ok(node, p) else P()

    specs = replicated(params)
    blocks = params["blocks"]
    stacked = not isinstance(blocks, (list, tuple))

    def blk_spec(node, p):
        """Prepend the stacked layers dim when blocks are stacked."""
        if stacked:
            p = P(None, *p)
        return maybe(node, p)

    def linear_spec(lin, w_p, b_p):
        """Spec for one linear, plain {"w","b"} or weight-only-int8
        {"w_q","scale","b"} (utils/quant.py): w_q shards like w; the
        per-output-channel scale shards with the output dim."""
        out_ax = w_p[-1]  # output-dim axis name ("model" or None)
        if "w_q" in lin:
            sp = {"w_q": blk_spec(lin["w_q"], w_p),
                  "scale": blk_spec(lin["scale"], P(out_ax))}
        else:
            sp = {"w": blk_spec(lin["w"], w_p)}
        if "b" in lin:
            sp["b"] = blk_spec(lin["b"], b_p) if b_p != P() else P()
        return sp

    blk_list = [blocks] if stacked else list(blocks)
    spec_list = [specs["blocks"]] if stacked else list(specs["blocks"])
    for blk, sp in zip(blk_list, spec_list):
        sp["attn"]["qkv"] = linear_spec(blk["attn"]["qkv"],
                                        P(None, "model"), P("model"))
        sp["attn"]["proj"] = linear_spec(blk["attn"]["proj"],
                                         P("model", None), P())
        sp["mlp"]["fc"] = linear_spec(blk["mlp"]["fc"],
                                      P(None, "model"), P("model"))
        sp["mlp"]["proj"] = linear_spec(blk["mlp"]["proj"],
                                        P("model", None), P())
    # output heads shard the vocab dim where divisible
    def head_spec(lin):
        if "w_q" in lin:
            sp = {"w_q": maybe(lin["w_q"], P(None, "model")),
                  "scale": maybe(lin["scale"], P("model"))}
        else:
            sp = {"w": maybe(lin["w"], P(None, "model"))}
        if "b" in lin:
            sp["b"] = maybe(lin["b"], P("model"))
        return sp

    specs["mel_head"] = head_spec(params["mel_head"])
    specs["text_head"] = head_spec(params["text_head"])
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
