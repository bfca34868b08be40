"""Optimizer factory — parity with init_optimizer
(/root/reference/src/utils/training_utils.py:6-28): adam with betas (0.8,
0.9), eps 1e-6, base lr 1.0 modulated by the per-step schedule (the
LambdaLR-with-lr-1.0 pattern, supervised_eventID.py:198-207); plus rmsprop /
sgd / adagrad / adadelta / lars / lamb / novograd, all via optax.

The LARS implementation the reference vendors (src/utils/lars.py) is optax's
``lars`` here — trust-ratio scaling per layer, the same math.
"""

from __future__ import annotations

from typing import Callable

import optax

from ..config.schema import OptimizerConfig, OptimizerKind


def build_optimizer(
    cfg: OptimizerConfig, lr_schedule: Callable
) -> optax.GradientTransformation:
    kind = cfg.name
    wd = cfg.weight_decay

    if kind == OptimizerKind.adam:
        # reference: Adam(lr=1.0 scaled by LambdaLR, betas=(0.8, 0.9), eps=1e-6)
        opt = optax.adamw(
            learning_rate=lr_schedule, b1=0.8, b2=0.9, eps=1e-6, weight_decay=wd
        )
    elif kind == OptimizerKind.rmsprop:
        opt = optax.rmsprop(learning_rate=lr_schedule)
    elif kind == OptimizerKind.sgd:
        opt = optax.sgd(learning_rate=lr_schedule)
    elif kind == OptimizerKind.adagrad:
        opt = optax.adagrad(learning_rate=lr_schedule)
    elif kind == OptimizerKind.adadelta:
        opt = optax.adadelta(learning_rate=lr_schedule)
    elif kind == OptimizerKind.lars:
        opt = optax.lars(learning_rate=lr_schedule, weight_decay=wd)
    elif kind == OptimizerKind.lamb:
        opt = optax.lamb(learning_rate=lr_schedule, weight_decay=wd)
    elif kind == OptimizerKind.novograd:
        opt = optax.novograd(learning_rate=lr_schedule, weight_decay=wd)
    else:
        raise ValueError(f"unsupported optimizer {kind}")

    # flatten elementwise updates into one vector: collapses the ~166
    # per-tensor update chains (one XLA fusion + dispatch each) into a few
    # big ops.  Per-layer-norm optimizers (lars/lamb/novograd) are
    # excluded — flattening would replace their per-tensor trust ratios
    # with one global ratio (different math).
    elementwise = kind in (
        OptimizerKind.adam, OptimizerKind.rmsprop, OptimizerKind.sgd,
        OptimizerKind.adagrad, OptimizerKind.adadelta,
    )
    if getattr(cfg, "flatten_update", False) and elementwise:
        opt = optax.flatten(opt)
    if cfg.gradient_accumulation > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=cfg.gradient_accumulation)
    return opt
