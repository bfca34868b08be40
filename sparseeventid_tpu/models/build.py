"""Model assembly — equivalent of build_networks
(/root/reference/src/networks/classification_head.py:30-55): encoder + per-
label heads, selected by framework mode (sparse / dense / graph) and encoder
family (convnet / pointnet / dgcnn)."""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import flax.linen as nn
import jax

from ..config.schema import (
    ConvRepresentation,
    DataMode,
    OUTPUT_SHAPE,
    SparseEventIDConfig,
    image_size,
)
from ..ops import SparseTensor
from .encoder import Encoder, capacity_schedule, encoder_output_shape
from .heads import DenseChainHead, MultiHeadOutput, pool_encoded


class SparseEventClassifier(nn.Module):
    """Flagship model: sparse ResNet encoder + 4-head classifier.

    __call__(st, train) -> dict of logits keyed by label
    (labelneutID/labelprotID/labelnpiID/labelcpiID,
    supervised_eventID.py:224-229).
    """

    encoder_cfg: ConvRepresentation
    output_shape: Mapping[str, int]
    dimension: int
    capacities: Tuple[int, ...] = ()
    head_hidden: int = 256
    head_dropout: float = 0.5
    axis_name: str | None = None
    remat: bool = False
    backend: str = "xla"

    @nn.compact
    def __call__(
        self, st: SparseTensor, train: bool = True, plans=None
    ) -> Dict[str, jax.Array]:
        encoded = Encoder(
            self.encoder_cfg,
            self.dimension,
            capacities=self.capacities,
            axis_name=self.axis_name,
            remat=self.remat,
            backend=self.backend,
            name="encoder",
        )(st, train, plans)
        if getattr(self.encoder_cfg, "per_label_final_series", False):
            # legacy multiplane topology: one final BlockSeries per label on
            # the shared encoder output, then per-label pool + head
            # (sparseresnet.py:285-333). All label series share one plan
            # (same site set).
            from ..models.blocks import SparseBlockSeries
            from ..ops.engine import build_series_plan

            if self.dimension == 2 and getattr(
                self.encoder_cfg, "plane_merge_depth", -1
            ) >= 0:
                ksz = (3,) * 3
            elif self.dimension == 2:
                ksz = (1, self.encoder_cfg.filter_size,
                       self.encoder_cfg.filter_size)
            else:
                ksz = (self.encoder_cfg.filter_size,) * self.dimension
            rb = build_series_plan(encoded, ksz, backend=self.backend)
            logits = {}
            for key, n in self.output_shape.items():
                branch = SparseBlockSeries(
                    self.encoder_cfg.blocks_per_layer,
                    self.encoder_cfg,
                    axis_name=self.axis_name,
                    name=f"final_series_{key}",
                )(encoded, rb, train)
                logits[key] = DenseChainHead(
                    n, self.head_hidden, self.head_dropout, name=f"head_{key}"
                )(pool_encoded(branch), train)
            return logits
        pooled = pool_encoded(encoded)
        return MultiHeadOutput(
            self.output_shape, self.head_hidden, self.head_dropout, name="head"
        )(pooled, train)


def build_sparse_classifier(
    cfg: SparseEventIDConfig,
    axis_name: str | None = None,
    output_shape: Mapping[str, int] | None = None,
) -> SparseEventClassifier:
    """Build the flagship model from a config tree. ``output_shape``
    overrides the 4-head default (e.g. {'weak_label': 2} for the
    unsupervised_eventID task, unsupervised_eventID.py:360)."""
    enc = cfg.encoder
    if not isinstance(enc, ConvRepresentation):
        raise TypeError("sparse classifier requires encoder=convnet")
    from ..config.schema import sparse_capacity

    caps = capacity_schedule(
        sparse_capacity(cfg),
        enc.depth,
        cfg.framework.capacity_shrink,
        cfg.framework.min_capacity,
    )
    return SparseEventClassifier(
        encoder_cfg=enc,
        output_shape=output_shape or OUTPUT_SHAPE,
        dimension=cfg.data.dimension,
        capacities=caps,
        head_hidden=cfg.head.hidden,
        head_dropout=cfg.head.dropout,
        axis_name=axis_name,
        remat=cfg.framework.remat,
        backend=cfg.framework.sparse_backend,
    )


class PointCloudWrapper(nn.Module):
    """Uniform __call__(batch, train) signature for point-cloud models:
    batch = (points [.., P, F], mask [.., P])."""

    inner: nn.Module

    @nn.compact
    def __call__(self, batch, train: bool = True):
        pts, mask = batch
        return self.inner(pts, mask, train)


def build_model(cfg: SparseEventIDConfig, axis_name: str | None = None):
    """(model, input_mode) with input_mode in {sparse, dense, points}.

    Selection mirrors the reference: framework.mode picks sparse/dense/graph
    for conv encoders (resnet.py:170-182); pointnet/dgcnn encoder configs
    pick the point-cloud family (legacy src/networks/torch/{pointnet,dgcnn}).
    """
    from ..config.schema import (
        DataMode,
        DGCNNRepresentation,
        PointNetRepresentation,
    )

    enc = cfg.encoder
    if isinstance(enc, PointNetRepresentation):
        inner = __import__(
            "sparseeventid_tpu.models.pointnet", fromlist=["PointNetClassifier"]
        ).PointNetClassifier(
            OUTPUT_SHAPE, use_tnet=enc.tnet,
            head_hidden=cfg.head.hidden, dropout=cfg.head.dropout,
        )
        return PointCloudWrapper(inner), "points"
    if isinstance(enc, DGCNNRepresentation):
        inner = __import__(
            "sparseeventid_tpu.models.dgcnn", fromlist=["DGCNNClassifier"]
        ).DGCNNClassifier(
            OUTPUT_SHAPE, k=enc.k, emb_dims=enc.emb_dims,
            head_hidden=cfg.head.hidden, dropout=cfg.head.dropout,
        )
        return PointCloudWrapper(inner), "points"
    if cfg.framework.mode == DataMode.dense:
        from .dense import DenseEventClassifier

        return (
            DenseEventClassifier(
                enc, OUTPUT_SHAPE, dimension=cfg.data.dimension,
                head_hidden=cfg.head.hidden, head_dropout=cfg.head.dropout,
            ),
            "dense",
        )
    # sparse (default) and graph both ride the sparse engine; the reference
    # graph mode (mpnn) does not exist upstream — DGCNN covers graph-style
    # modeling via encoder=dgcnn.
    return build_sparse_classifier(cfg, axis_name=axis_name), "sparse"
