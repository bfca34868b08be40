"""Model assembly — equivalent of build_networks
(/root/reference/src/networks/classification_head.py:30-55): encoder + per-
label heads, selected by framework mode (sparse / dense / graph)."""

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
from .heads import MultiHeadOutput, pool_encoded


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
    def __call__(self, st: SparseTensor, train: bool = True) -> Dict[str, jax.Array]:
        encoded = Encoder(
            self.encoder_cfg,
            self.dimension,
            capacities=self.capacities,
            axis_name=self.axis_name,
            remat=self.remat,
            backend=self.backend,
            name="encoder",
        )(st, train)
        pooled = pool_encoded(encoded)
        return MultiHeadOutput(
            self.output_shape, self.head_hidden, self.head_dropout, name="head"
        )(pooled, train)


def build_sparse_classifier(
    cfg: SparseEventIDConfig, axis_name: str | None = None
) -> SparseEventClassifier:
    """Build the flagship model from a config tree."""
    enc = cfg.encoder
    if not isinstance(enc, ConvRepresentation):
        raise TypeError("sparse classifier requires encoder=convnet")
    caps = capacity_schedule(
        cfg.data.max_voxels,
        enc.depth,
        cfg.framework.capacity_shrink,
        cfg.framework.min_capacity,
    )
    return SparseEventClassifier(
        encoder_cfg=enc,
        output_shape=OUTPUT_SHAPE,
        dimension=cfg.data.dimension,
        capacities=caps,
        head_hidden=cfg.head.hidden,
        head_dropout=cfg.head.dropout,
        axis_name=axis_name,
        remat=cfg.framework.remat,
        backend=cfg.framework.sparse_backend,
    )
