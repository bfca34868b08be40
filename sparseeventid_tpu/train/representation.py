"""SimCLR self-supervised representation learning — parity with
/root/reference/src/utils/representation_learning.py (rep_trainer):
two augmented views -> shared encoder -> projection -> NT-Xent over the
GLOBAL batch (all_gather across replicas, :155), with top-1/top-5 positive
retrieval metrics (:227-244).

The cross-rank gather inside the loss is jax.lax.all_gather under shard_map
(the reference's differentiable Lightning all_gather); on a single device
the axis_name is simply None.
"""

from __future__ import annotations

from typing import Callable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ..config.schema import ConvRepresentation
from ..models.encoder import Encoder
from ..models.heads import pool_encoded
from ..ops import SparseTensor
from .losses import nt_xent_loss, nt_xent_top_k_accuracy
from .state import TrainState


class ProjectionHead(nn.Module):
    """SimCLR MLP projector (Linear-ReLU-Linear)."""

    hidden: int = 256
    out: int = 128

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.relu(nn.Dense(self.hidden, name="fc1")(x))
        return nn.Dense(self.out, name="fc2")(x)


class RepresentationModel(nn.Module):
    """Shared encoder + projector applied to each view."""

    encoder_cfg: ConvRepresentation
    dimension: int
    capacities: Tuple[int, ...] = ()
    projection_dim: int = 128
    backend: str = "xla"
    remat: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(
        self, view1: SparseTensor, view2: SparseTensor, train: bool = True,
        plans1=None, plans2=None,
    ) -> Tuple[jax.Array, jax.Array]:
        encoder = Encoder(
            self.encoder_cfg,
            self.dimension,
            capacities=self.capacities,
            axis_name=self.axis_name,
            remat=self.remat,
            backend=self.backend,
            name="encoder",
        )
        projector = ProjectionHead(out=self.projection_dim, name="projector")
        z1 = projector(pool_encoded(encoder(view1, train, plans1)))
        z2 = projector(pool_encoded(encoder(view2, train, plans2)))
        return z1, z2


def make_simclr_train_step(
    model: RepresentationModel,
    optimizer: optax.GradientTransformation,
    lr_schedule: Callable | None = None,
    temperature: float = 0.1,
    axis_name: str | None = None,
    plans_builder=None,
):
    """step(state, view1, view2, host_plans, rng) -> (state, metrics).

    ``host_plans`` is a (dict1, dict2) pair of host-built plan arrays for
    the two augmented views (or None for the device plan builders)."""

    def loss_fn(params, batch_stats, v1, v2, host, rng):
        extra = ()
        if plans_builder is not None and host is not None:
            extra = (plans_builder(v1, host[0]), plans_builder(v2, host[1]))
        (z1, z2), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            v1, v2, True, *extra,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        loss = nt_xent_loss(z1, z2, temperature, axis_name=axis_name)
        return loss, (z1, z2, mutated["batch_stats"])

    def step(state: TrainState, v1, v2, host, rng):  # noqa: D401
        rng = jax.random.fold_in(rng, state.step)
        (loss, (z1, z2, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, v1, v2, host, rng)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss/loss": loss,
            "acc/top1": nt_xent_top_k_accuracy(z1, z2, temperature, 1),
            "acc/top5": nt_xent_top_k_accuracy(z1, z2, temperature, 5),
        }
        if axis_name is not None:
            metrics = {k: jax.lax.pmean(v, axis_name) for k, v in metrics.items()}
        if lr_schedule is not None:
            metrics["opt/lr"] = lr_schedule(state.step)
        return TrainState(new_params, new_stats, new_opt, state.step + 1), metrics

    return step


def make_simclr_eval_step(
    model: RepresentationModel,
    temperature: float = 0.1,
    axis_name: str | None = None,
    plans_builder=None,
):
    """eval(state, view1, view2, host_plans) -> metrics."""

    def step(state: TrainState, v1, v2, host):
        extra = ()
        if plans_builder is not None and host is not None:
            extra = (plans_builder(v1, host[0]), plans_builder(v2, host[1]))
        z1, z2 = model.apply(state.variables(), v1, v2, False, *extra)
        metrics = {
            "loss/loss": nt_xent_loss(z1, z2, temperature, axis_name=axis_name),
            "acc/top1": nt_xent_top_k_accuracy(z1, z2, temperature, 1),
            "acc/top5": nt_xent_top_k_accuracy(z1, z2, temperature, 5),
        }
        if axis_name is not None:
            metrics = {k: jax.lax.pmean(v, axis_name) for k, v in metrics.items()}
        return metrics

    return step
