"""Training step for UnifiedVoice (text+mel cross-entropy) under a DP×TP mesh.

The reference ships the losses inside its models but no trainer (SURVEY §0);
this module provides the TPU-native training loop building block: an optax
AdamW step jitted over a ``Mesh`` with sharded params (parallel/mesh.py) and
data-parallel batches. XLA inserts all collectives (gradient psums over
``data``, activation psums over ``model``) from the sharding annotations.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from index_tts_dubbing_tpu.models import gpt as gpt_model
from index_tts_dubbing_tpu.models.gpt import GPTConfig


class TrainState(NamedTuple):
    params: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01,
                   warmup: int = 100) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, 10_000)
    return optax.chain(optax.clip_by_global_norm(1.0),
                       optax.adamw(sched, weight_decay=weight_decay))


def init_state(params: Dict[str, Any],
               tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def loss_fn(params: Dict[str, Any], cfg: GPTConfig, batch: Dict[str, Any]
            ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    lt, lm = gpt_model.forward_train(
        params, cfg, batch["cond_mel"], batch["cond_lens"],
        batch["text_ids"], batch["text_lens"], batch["codes"],
        batch["code_lens"])
    loss = lt + lm
    return loss, {"loss_text": lt, "loss_mel": lm}


@partial(jax.jit, static_argnames=("cfg", "tx"), donate_argnums=(0,))
def train_step(state: TrainState, batch: Dict[str, Any], cfg: GPTConfig,
               tx: optax.GradientTransformation
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, cfg, batch)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics["loss"] = loss
    return TrainState(params, opt_state, state.step + 1), metrics


# --- checkpointing ----------------------------------------------------------

def save_state(path: str, state: TrainState) -> None:
    """Persist params+opt_state+step as one npz tree (resume-capable — the
    reference has load-only checkpoints, SURVEY §5)."""
    from index_tts_dubbing_tpu.utils.checkpoint import save_params
    import numpy as np

    save_params(path, {"params": jax.tree.map(np.asarray, state.params),
                       "opt_state": jax.tree.map(
                           np.asarray, jax.tree.flatten(state.opt_state)[0]),
                       "step": np.asarray(state.step)})


def load_state(path: str, tx: optax.GradientTransformation,
               like: TrainState) -> TrainState:
    from index_tts_dubbing_tpu.utils.checkpoint import load_params

    tree = load_params(path)
    flat_opt, treedef = jax.tree.flatten(like.opt_state)
    opt_state = jax.tree.unflatten(treedef, tree["opt_state"])
    return TrainState(tree["params"], opt_state,
                      jnp.asarray(tree["step"]))
