"""Classification heads — parity with
/root/reference/src/networks/classification_head.py.

Reference chain per label (classification_head.py:19-28):
  AvgPool3d(full spatial) -> Flatten -> Linear(C->256) -> Dropout ->
  LeakyReLU -> Linear(256->n_out)

The sparse-native AvgPool over the FULL final grid equals a masked sum
divided by the grid volume (tanh(0)=0 padding contributes nothing), so no
densify is needed — see ops/pool.py.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import flax.linen as nn
import jax

from ..ops import SparseTensor, global_avg_pool


class DenseChainHead(nn.Module):
    """Linear -> Dropout -> LeakyReLU -> Linear over pooled features."""

    n_out: int
    hidden: int = 256
    dropout: float = 0.5

    @nn.compact
    def __call__(self, pooled: jax.Array, train: bool = True) -> jax.Array:
        x = nn.Dense(self.hidden, name="fc1")(pooled)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.leaky_relu(x, negative_slope=0.01)  # torch.nn.LeakyReLU default
        return nn.Dense(self.n_out, name="fc2")(x)


class MultiHeadOutput(nn.Module):
    """One head per label key (classification_head.py:7-17)."""

    output_shape: Mapping[str, int]
    hidden: int = 256
    dropout: float = 0.5

    @nn.compact
    def __call__(self, pooled: jax.Array, train: bool = True) -> Dict[str, jax.Array]:
        return {
            key: DenseChainHead(n, self.hidden, self.dropout, name=key)(pooled, train)
            for key, n in self.output_shape.items()
        }


def pool_encoded(st: SparseTensor) -> jax.Array:
    """AvgPool3d(full spatial) on the encoded sparse tensor -> [B, C]."""
    return global_avg_pool(st, divide_by="volume")
