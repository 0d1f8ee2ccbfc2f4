"""Shared training-state helpers (optax + flax TrainState)."""

from __future__ import annotations

from typing import Optional

import optax
from flax.training import train_state


def make_state(
    model, params, lr: float = 1e-4, clip_norm: Optional[float] = 1.0
) -> train_state.TrainState:
    """Adam with global-norm clipping — the reference's default recipe
    (Adam + clip_grad_norm_(1.0), GAN_V17.12/gan.py:279-372)."""
    tx = [optax.clip_by_global_norm(clip_norm)] if clip_norm else []
    tx.append(optax.adam(lr))
    return train_state.TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.chain(*tx)
    )
