"""Training harness: losses, loops, checkpointing, datasets.

The reference's three training patterns (SURVEY.md §7.7) as reusable,
fully-batched jit programs:

- physics-informed generative loop (G-adversarial / D / "informed" energy
  phases) — ``mdx.train.cgan``
- phase-space derivative regression with recurrent unroll (HNN) —
  ``mdx.train.hnn``
- windowed sequence prediction with geometric losses — ``mdx.train.seq``

The reference evaluated the force field once per sample inside Python loops
(GAN_V37/gan.py:430-448); here every energy evaluation is ``jax.vmap`` over
the batch inside the jitted update, which is where the epoch-time win over
the V100 baseline comes from.
"""

from molecular_dynamics_tpu.train.losses import (
    potential_loss,
    bias_energy_loss,
    distance_matrix_loss,
    torsion_loss,
    window_composite_loss,
)
from molecular_dynamics_tpu.train.datasets import (
    TrajectoryData,
    frame_time_batches,
    window_batches,
    phase_space_pairs,
)

__all__ = [
    "potential_loss",
    "bias_energy_loss",
    "distance_matrix_loss",
    "torsion_loss",
    "window_composite_loss",
    "TrajectoryData",
    "frame_time_batches",
    "window_batches",
    "phase_space_pairs",
]
