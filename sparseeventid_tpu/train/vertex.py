"""YOLO-style vertex finding — capability parity with
/root/reference/src/utils/vertex_finding.py (vertex_learning): single-anchor
3D vertex regression on a coarse anchor grid + event classification.  The
reference task is broken upstream (missing yolo_head import,
classification_head.py:36); this is a working implementation.

Label construction (:294-359): the anchor cell containing the true vertex
gets objectness 1 and a normalized in-cell offset target.  Loss (:361-429):
focal/BCE objectness over the grid + MSE on the in-cell offsets at the
positive anchor + CE on the event class.  Metrics (:244-291): vertex
resolution fractions within 5/10/20 cm using the detector metadata
(dune3d: 0.4 cm voxels, meta at larcv_fetcher.py:37-56).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ..config.schema import ConvRepresentation
from ..models.encoder import Encoder
from ..ops import SparseTensor, to_dense
from .state import TrainState


class VertexHead(nn.Module):
    """Dense conv head over the encoder's final (coarse) grid:
    per-anchor (objectness, dx, dy, dz) + event-class logits."""

    n_event_classes: int = 3
    hidden: int = 64

    @nn.compact
    def __call__(self, dense: jax.Array, train: bool = True):
        # dense: [B, X, Y, Z, C]
        h = nn.Conv(self.hidden, (3, 3, 3), name="conv1")(dense)
        h = nn.leaky_relu(h, 0.01)
        anchor = nn.Conv(4, (1, 1, 1), name="anchor_out")(h)  # logit + 3 offsets
        pooled = jnp.mean(h, axis=(1, 2, 3))
        event_logits = nn.Dense(self.n_event_classes, name="event_out")(pooled)
        return anchor, event_logits


class VertexModel(nn.Module):
    encoder_cfg: ConvRepresentation
    dimension: int
    capacities: Tuple[int, ...] = ()
    n_event_classes: int = 3
    backend: str = "xla"
    remat: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = True, plans=None):
        encoded = Encoder(
            self.encoder_cfg, self.dimension, capacities=self.capacities,
            axis_name=self.axis_name, remat=self.remat, backend=self.backend,
            name="encoder",
        )(st, train, plans)
        dense = to_dense(encoded)  # [B, x, y, z, C] — coarse grid, small
        return VertexHead(self.n_event_classes, name="head")(dense, train)


def build_vertex_labels(
    vertex_xyz: jax.Array,  # [B, 3] in voxel units of the FULL grid
    anchor_grid: Tuple[int, int, int],
    full_grid: Tuple[int, int, int],
):
    """-> (objectness [B, X, Y, Z], cell offsets [B, 3] in [0,1), cell idx)."""
    scale = jnp.asarray(
        [f / a for f, a in zip(full_grid, anchor_grid)], jnp.float32
    )
    cell_f = vertex_xyz / scale
    cell = jnp.clip(
        cell_f.astype(jnp.int32), 0,
        jnp.asarray(anchor_grid, jnp.int32) - 1,
    )
    offset = cell_f - cell  # in [0, 1)
    b = vertex_xyz.shape[0]
    obj = jnp.zeros((b, *anchor_grid), jnp.float32)
    obj = obj.at[jnp.arange(b), cell[:, 0], cell[:, 1], cell[:, 2]].set(1.0)
    return obj, offset, cell


def vertex_loss(
    anchor_pred: jax.Array,  # [B, X, Y, Z, 4]
    event_logits: jax.Array,
    obj_target: jax.Array,
    offset_target: jax.Array,
    cell: jax.Array,
    event_label: jax.Array,
    lambda_obj: float = 1.0,
    lambda_off: float = 5.0,
    lambda_evt: float = 1.0,
):
    logit = anchor_pred[..., 0]
    # focal-weighted BCE objectness (the reference's loss balances the single
    # positive cell against ~20k negatives)
    p = jax.nn.sigmoid(logit)
    bce = -(
        obj_target * jnp.log(jnp.clip(p, 1e-7, 1.0))
        + (1 - obj_target) * jnp.log(jnp.clip(1 - p, 1e-7, 1.0))
    )
    focal = jnp.where(obj_target > 0, (1 - p) ** 2 * 100.0, p**2)
    obj_loss = jnp.mean(focal * bce, axis=(1, 2, 3)).mean()

    b = logit.shape[0]
    pred_off = jax.nn.sigmoid(
        anchor_pred[jnp.arange(b), cell[:, 0], cell[:, 1], cell[:, 2], 1:]
    )
    off_loss = jnp.mean(jnp.sum((pred_off - offset_target) ** 2, axis=-1))

    logp = jax.nn.log_softmax(event_logits, axis=-1)
    evt_loss = -jnp.mean(
        jnp.take_along_axis(logp, event_label[:, None], axis=-1)
    )
    total = lambda_obj * obj_loss + lambda_off * off_loss + lambda_evt * evt_loss
    return total, {
        "loss/objectness": obj_loss,
        "loss/offset": off_loss,
        "loss/event": evt_loss,
    }


def predict_vertex(
    anchor_pred: jax.Array, anchor_grid, full_grid
) -> jax.Array:
    """argmax anchor + predicted offset -> vertex in full-grid voxel units."""
    b = anchor_pred.shape[0]
    flat = anchor_pred[..., 0].reshape(b, -1)
    idx = jnp.argmax(flat, axis=-1)
    cx = idx // (anchor_grid[1] * anchor_grid[2])
    cy = (idx // anchor_grid[2]) % anchor_grid[1]
    cz = idx % anchor_grid[2]
    cell = jnp.stack([cx, cy, cz], axis=-1)
    off = jax.nn.sigmoid(
        anchor_pred[jnp.arange(b), cx, cy, cz, 1:]
    )
    scale = jnp.asarray(
        [f / a for f, a in zip(full_grid, anchor_grid)], jnp.float32
    )
    return (cell.astype(jnp.float32) + off) * scale


def vertex_resolution_metrics(
    pred_voxels: jax.Array,
    true_voxels: jax.Array,
    cm_per_voxel: float = 0.4,  # dune3d meta (larcv_fetcher.py:37-56)
) -> Dict[str, jax.Array]:
    """Fractions within 5/10/20 cm (vertex_finding.py:244-291)."""
    dist_cm = (
        jnp.linalg.norm(pred_voxels - true_voxels, axis=-1) * cm_per_voxel
    )
    return {
        "vertex/mean_dist_cm": jnp.mean(dist_cm),
        "vertex/frac_5cm": jnp.mean((dist_cm < 5.0).astype(jnp.float32)),
        "vertex/frac_10cm": jnp.mean((dist_cm < 10.0).astype(jnp.float32)),
        "vertex/frac_20cm": jnp.mean((dist_cm < 20.0).astype(jnp.float32)),
    }


def make_vertex_train_step(
    model: VertexModel,
    optimizer: optax.GradientTransformation,
    anchor_grid: Tuple[int, int, int],
    full_grid: Tuple[int, int, int],
    lr_schedule: Callable | None = None,
    axis_name: str | None = None,
    plans_builder=None,
):
    """step(state, st, vertex, event_label, host_plans, rng).  When
    ``plans_builder`` is given and host_plans is a dict of host-built plan
    arrays (io/_hostio.cpp), the encoder consumes precomputed window plans
    — no plan construction on device (same contract as the supervised
    task)."""

    def loss_fn(params, batch_stats, st, vertex, event_label, host, rng):
        extra = ()
        if plans_builder is not None and host is not None:
            extra = (plans_builder(st, host),)
        (anchor_pred, event_logits), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, st, True, *extra,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        obj_t, off_t, cell = build_vertex_labels(vertex, anchor_grid, full_grid)
        loss, parts = vertex_loss(
            anchor_pred, event_logits, obj_t, off_t, cell, event_label
        )
        return loss, (anchor_pred, mutated["batch_stats"], parts)

    def step(state: TrainState, st, vertex, event_label, host, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, (anchor_pred, new_stats, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, st, vertex, event_label, host,
          rng)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss/loss": loss, **parts}
        pred_v = predict_vertex(anchor_pred, anchor_grid, full_grid)
        metrics.update(vertex_resolution_metrics(pred_v, vertex))
        if lr_schedule is not None:
            metrics["opt/lr"] = lr_schedule(state.step)
        return TrainState(new_params, new_stats, new_opt, state.step + 1), metrics

    return step


def make_vertex_predict_step(
    model: VertexModel,
    anchor_grid: Tuple[int, int, int],
    full_grid: Tuple[int, int, int],
    plans_builder=None,
):
    """Per-event inference outputs for validation saving
    (vertex_finding.py:110-128 metrics_list contract: the reference
    collects true label/vertex plus the predicted anchor map, vertex,
    and event label per event and dumps them to
    output_dir/validation_output/val_rank_N.npz)."""

    def step(state: TrainState, st, vertex, event_label, host):
        extra = ()
        if plans_builder is not None and host is not None:
            extra = (plans_builder(st, host),)
        anchor_pred, event_logits = model.apply(
            state.variables(), st, False, *extra)
        pred_v = predict_vertex(anchor_pred, anchor_grid, full_grid)
        return {
            "label": event_label,
            "vertex_true": vertex,
            "anchor": jax.nn.sigmoid(anchor_pred[..., 0]),
            "vertex": pred_v,
            "pred_label": jnp.argmax(event_logits, axis=-1),
        }

    return step


def make_vertex_eval_step(
    model: VertexModel,
    anchor_grid: Tuple[int, int, int],
    full_grid: Tuple[int, int, int],
    axis_name: str | None = None,
    plans_builder=None,
):
    """eval(state, st, vertex, event_label, host_plans) -> metrics
    (validation_step parity, vertex_finding.py:244-291 resolution
    metrics)."""

    def step(state: TrainState, st, vertex, event_label, host):
        extra = ()
        if plans_builder is not None and host is not None:
            extra = (plans_builder(st, host),)
        anchor_pred, event_logits = model.apply(
            state.variables(), st, False, *extra)
        obj_t, off_t, cell = build_vertex_labels(vertex, anchor_grid, full_grid)
        loss, parts = vertex_loss(
            anchor_pred, event_logits, obj_t, off_t, cell, event_label
        )
        metrics = {"loss/loss": loss, **parts}
        pred_v = predict_vertex(anchor_pred, anchor_grid, full_grid)
        metrics.update(vertex_resolution_metrics(pred_v, vertex))
        if axis_name is not None:
            metrics = {k: jax.lax.pmean(v, axis_name) for k, v in metrics.items()}
        return metrics

    return step
