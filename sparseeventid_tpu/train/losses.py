"""Loss functions — parity with the reference task layer.

Supervised 4-head loss (/root/reference/src/utils/supervised_eventID.py:168-196):
focal loss (gamma=2, softmax clamped to [1e-7, 1-1e-7]) or cross-entropy with
label_smoothing=0.1 (and optional class weights for the 'even' scheme,
supervised_eventID.py:44-47), summed over heads.

NT-Xent (SimCLR) for representation learning
(/root/reference/src/utils/representation_learning.py:128-280), with the
cross-replica all_gather done via jax.lax.all_gather inside shard_map.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import jax
import jax.numpy as jnp

from ..config.schema import LossBalanceScheme


def focal_loss(logits: jax.Array, labels: jax.Array, gamma: float = 2.0) -> jax.Array:
    """Mean over batch of sum_c -(1-p_c)^gamma * y_c * log(p_c)."""
    n_classes = logits.shape[-1]
    y = jax.nn.one_hot(labels, n_classes, dtype=logits.dtype)
    p = jax.nn.softmax(logits, axis=-1)
    p = jnp.clip(p, 1e-7, 1.0 - 1e-7)
    loss = -y * jnp.log(p) * (1.0 - p) ** gamma
    return jnp.mean(jnp.sum(loss, axis=-1))


def smoothed_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    label_smoothing: float = 0.1,
    class_weights: jax.Array | None = None,
) -> jax.Array:
    """torch.nn.CrossEntropyLoss(weight, label_smoothing) semantics:
    weighted mean over batch with weights = class_weights[label]."""
    n_classes = logits.shape[-1]
    y = jax.nn.one_hot(labels, n_classes, dtype=logits.dtype)
    y = y * (1.0 - label_smoothing) + label_smoothing / n_classes
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_example = -jnp.sum(y * logp, axis=-1)
    if class_weights is not None:
        w = class_weights[labels]
        return jnp.sum(per_example * w) / jnp.maximum(jnp.sum(w), 1e-9)
    return jnp.mean(per_example)


def multi_head_loss(
    logits: Mapping[str, jax.Array],
    labels: Mapping[str, jax.Array],
    scheme: LossBalanceScheme = LossBalanceScheme.focal,
    class_weights: Mapping[str, jax.Array] | None = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Sum of per-head losses (supervised_eventID.py:190-196)."""
    per_head = {}
    for key, lg in logits.items():
        lb = labels[key]
        if scheme == LossBalanceScheme.focal:
            per_head[key] = focal_loss(lg, lb)
        else:
            w = class_weights.get(key) if class_weights else None
            per_head[key] = smoothed_cross_entropy(lg, lb, 0.1, w)
    total = sum(per_head.values())
    return total, per_head


def multi_head_accuracy(
    logits: Mapping[str, jax.Array], labels: Mapping[str, jax.Array]
) -> Dict[str, jax.Array]:
    """Per-head mean accuracy (supervised_eventID.py:158-165)."""
    return {
        key: jnp.mean((jnp.argmax(lg, axis=-1) == labels[key]).astype(jnp.float32))
        for key, lg in logits.items()
    }


def nt_xent_loss(
    z1: jax.Array,
    z2: jax.Array,
    temperature: float = 0.1,
    axis_name: str | None = None,
) -> jax.Array:
    """SimCLR NT-Xent over GLOBAL batch: representations from every replica
    are gathered (representation_learning.py:155 self.all_gather) so positives
    compete against all 2*B_global-2 negatives.

    z1, z2: [B_local, D] two augmented views.
    """
    if axis_name is not None:
        # [n_dev, B, D] -> [n_dev*B, D]; positions of the local block follow
        # the axis index, mirroring the reference's rank-offset indexing
        # (representation_learning.py:201-213).
        z1 = jax.lax.all_gather(z1, axis_name).reshape(-1, z1.shape[-1])
        z2 = jax.lax.all_gather(z2, axis_name).reshape(-1, z2.shape[-1])
    n = z1.shape[0]
    z = jnp.concatenate([z1, z2], axis=0)  # [2N, D]
    # smooth normalization: grad finite at z=0 (empty-event views)
    z = z * jax.lax.rsqrt(jnp.sum(z * z, axis=-1, keepdims=True) + 1e-12)
    sim = z @ z.T / temperature  # [2N, 2N]
    mask_self = jnp.eye(2 * n, dtype=bool)
    sim = jnp.where(mask_self, -1e9, sim)
    pos_idx = jnp.concatenate(
        [jnp.arange(n) + n, jnp.arange(n)]
    )  # positive of i is i+-N
    logp = jax.nn.log_softmax(sim, axis=-1)
    pos_logp = jnp.take_along_axis(logp, pos_idx[:, None], axis=-1)[:, 0]
    return -jnp.mean(pos_logp)


def nt_xent_top_k_accuracy(
    z1: jax.Array, z2: jax.Array, temperature: float = 0.1, k: int = 1
) -> jax.Array:
    """top-k retrieval accuracy of the positive pair
    (representation_learning.py:227-244)."""
    n = z1.shape[0]
    z = jnp.concatenate([z1, z2], axis=0)
    z = z * jax.lax.rsqrt(jnp.sum(z * z, axis=-1, keepdims=True) + 1e-12)
    sim = z @ z.T / temperature
    sim = jnp.where(jnp.eye(2 * n, dtype=bool), -1e9, sim)
    pos_idx = jnp.concatenate([jnp.arange(n) + n, jnp.arange(n)])
    k = min(k, 2 * n - 1)  # tiny-batch guard (k=5 with B<3)
    _, topk = jax.lax.top_k(sim, k)
    hit = jnp.any(topk == pos_idx[:, None], axis=-1)
    return jnp.mean(hit.astype(jnp.float32))
