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


def make_loss_fn(model, scheme: LossBalanceScheme, class_weights=None,
                 plans_builder=None):
    """plans_builder(st, host_plans_dict) -> EncoderPlans: when set, the
    sparse encoder consumes host-built window plans (ops/host_plans.py) and
    no plan construction runs on device."""

    def loss_fn(params, batch_stats, st, labels, host_plans, dropout_rng,
                train: bool):
        variables = {"params": params, "batch_stats": batch_stats}
        plans = (
            plans_builder(st, host_plans)
            if (plans_builder is not None and host_plans is not None)
            else None
        )
        extra = (plans,) if plans is not None else ()
        if train:
            logits, mutated = model.apply(
                variables,
                st,
                True,
                *extra,
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
            logits = model.apply(variables, st, False, *extra)
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
    plans_builder=None,
):
    """Returns step(state, st, labels, host_plans, rng) -> (state, metrics).

    Under shard_map, axis_name triggers cross-replica grad/metric pmean —
    the psum rides ICI, replacing NCCL allreduce.
    """
    loss_fn = make_loss_fn(model, scheme, class_weights, plans_builder)

    def step(state: TrainState, st: SparseTensor, labels, host_plans, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        (loss, (logits, new_stats, per_head, dropped)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, st, labels, host_plans,
          dropout_rng, True)
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
    plans_builder=None,
):
    """Returns eval(state, st, labels, host_plans) -> metrics."""
    loss_fn = make_loss_fn(model, scheme, class_weights, plans_builder)

    def step(state: TrainState, st: SparseTensor, labels, host_plans):
        loss, (logits, _, per_head, _) = loss_fn(
            state.params, state.batch_stats, st, labels, host_plans,
            jax.random.PRNGKey(0), False
        )
        metrics = {"loss/loss": loss}
        metrics.update(
            {f"acc/{k}": v for k, v in multi_head_accuracy(logits, labels).items()}
        )
        if axis_name is not None:
            metrics = {k: jax.lax.pmean(v, axis_name) for k, v in metrics.items()}
        return metrics

    return step


def make_predict_step(model, plans_builder=None):
    """Softmax per head for inference output writing
    (legacy ana_step parity, torch_inference.py:719-776)."""

    def step(state: TrainState, st: SparseTensor, host_plans=None):
        extra = ()
        if plans_builder is not None and host_plans is not None:
            extra = (plans_builder(st, host_plans),)
        logits = model.apply(state.variables(), st, False, *extra)
        return {k: jax.nn.softmax(v, axis=-1) for k, v in logits.items()}

    return step
