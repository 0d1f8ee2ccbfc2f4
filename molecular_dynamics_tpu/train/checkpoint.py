"""Checkpoint/resume for model, optimizer and MD state.

Covers the reference's persistence patterns (SURVEY.md §5): best-loss
checkpoints (GAN_V37/gan.py:466-469), staged pretrain -> GAN weight reuse
(cgan.py:547-569), periodic save-every-N (GAT-HNN-R-v2/train-HNN.py:205-208),
and job-chain resume (jobpip.sh + CSV epoch recovery, train-HNN.py:50-66).
Serialisation is flax msgpack — a single portable file per target; MD states
(pos/vel/forces/rng/step) checkpoint the same way, replacing NAMD's
``.restart`` files.
"""

from __future__ import annotations

import os
from typing import Any

from flax import serialization


def save(path: str, target: Any) -> None:
    """Serialise a pytree (params / opt state / MDState / dict of them)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(serialization.to_bytes(target))


def load(path: str, template: Any) -> Any:
    """Restore a pytree into the structure of ``template``."""
    with open(path, "rb") as fh:
        return serialization.from_bytes(template, fh.read())


class BestKeeper:
    """Keep the best-loss checkpoint on disk (GAN_V37/gan.py:466-469)."""

    def __init__(self, path: str):
        self.path = path
        self.best = float("inf")

    def update(self, loss: float, target: Any) -> bool:
        if loss < self.best:
            self.best = loss
            save(self.path, target)
            return True
        return False

    def rebase(self) -> None:
        """Reset the best-loss floor at a training-phase boundary.

        Multi-phase drivers (pretrain -> GAN, 1-step -> unrolled
        fine-tune) optimize incommensurable losses; without a rebase the
        later phase can never beat the earlier phase's numerically
        smaller loss and ``best.ckpt`` silently keeps the pre-phase
        model while the recorded eval comes from the post-phase params.
        """
        self.best = float("inf")


class PeriodicSaver:
    """Save every N steps + keep a rolling 'latest' for crash resume."""

    def __init__(self, path: str, every: int = 1000):
        self.path = path
        self.every = every

    def maybe_save(self, step: int, target: Any) -> bool:
        if step % self.every == 0:
            save(self.path, target)
            return True
        return False


def resume_or_init(path: str, template: Any) -> tuple:
    """(target, resumed) — restore if a checkpoint exists, else template.

    The framework's equivalent of the reference's SLURM-chain restart logic
    (GAT-HNN-R-v2/train-HNN.py:50-66): call at startup, keep training.
    """
    if os.path.exists(path):
        return load(path, template), True
    return template, False
