"""Supervised 4-head event-ID task — the TPU-native equivalent of
/root/reference/src/utils/supervised_eventID.py: pure loss/metric functions +
jitted train/val steps instead of a LightningModule.

The distributed variant runs the SAME step function under shard_map (see
parallel/data_parallel.py); gradients are pmean-reduced over the mesh axis,
replacing DDP/Horovod allreduce (distributed_trainer.py:87-97)."""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config.schema import LossBalanceScheme
from ..ops import SparseTensor
from .losses import multi_head_accuracy, multi_head_loss
from .state import TrainState


def make_loss_fn(model, scheme: LossBalanceScheme, class_weights=None):
    def loss_fn(params, batch_stats, st, labels, dropout_rng, train: bool):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            logits, mutated = model.apply(
                variables,
                st,
                True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats", "diagnostics"],
            )
            new_stats = mutated["batch_stats"]
            # Capacity-overflow drops sown by the sparse encoder
            # (window-plan sidecar overflow + downsample-site truncation);
            # a nonzero value means the conv math lost pairs this step.
            dropped = sum(
                jax.tree_util.tree_leaves(mutated.get("diagnostics", {})),
                start=jnp.zeros((), jnp.int32),
            )
        else:
            logits = model.apply(variables, st, False)
            new_stats = batch_stats
            dropped = jnp.zeros((), jnp.int32)
        loss, per_head = multi_head_loss(logits, labels, scheme, class_weights)
        return loss, (logits, new_stats, per_head, dropped)

    return loss_fn


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    scheme: LossBalanceScheme,
    lr_schedule: Callable | None = None,
    axis_name: str | None = None,
    class_weights=None,
):
    """Returns step(state, st, labels, rng) -> (state, metrics).

    Under shard_map, axis_name triggers cross-replica grad/metric pmean —
    the psum rides ICI, replacing NCCL allreduce.
    """
    loss_fn = make_loss_fn(model, scheme, class_weights)

    def step(state: TrainState, st: SparseTensor, labels, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        (loss, (logits, new_stats, per_head, dropped)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, st, labels, dropout_rng, True)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            dropped = jax.lax.psum(dropped, axis_name)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss/loss": loss, "overflow/dropped": dropped}
        acc = multi_head_accuracy(logits, labels)
        if axis_name is not None:
            acc = {k: jax.lax.pmean(v, axis_name) for k, v in acc.items()}
        metrics.update({f"acc/{k}": v for k, v in acc.items()})
        if lr_schedule is not None:
            metrics["opt/lr"] = lr_schedule(state.step)
        new_state = TrainState(new_params, new_stats, new_opt, state.step + 1)
        return new_state, metrics

    return step


def make_eval_step(
    model,
    scheme: LossBalanceScheme,
    axis_name: str | None = None,
    class_weights=None,
):
    """Returns eval(state, st, labels) -> metrics (validation_step parity)."""
    loss_fn = make_loss_fn(model, scheme, class_weights)

    def step(state: TrainState, st: SparseTensor, labels):
        loss, (logits, _, per_head, _) = loss_fn(
            state.params, state.batch_stats, st, labels, jax.random.PRNGKey(0), False
        )
        metrics = {"loss/loss": loss}
        metrics.update(
            {f"acc/{k}": v for k, v in multi_head_accuracy(logits, labels).items()}
        )
        if axis_name is not None:
            metrics = {k: jax.lax.pmean(v, axis_name) for k, v in metrics.items()}
        return metrics

    return step


def make_predict_step(model):
    """Softmax per head for inference output writing
    (legacy ana_step parity, torch_inference.py:719-776)."""

    def step(state: TrainState, st: SparseTensor):
        logits = model.apply(state.variables(), st, False)
        return {k: jax.nn.softmax(v, axis=-1) for k, v in logits.items()}

    return step
