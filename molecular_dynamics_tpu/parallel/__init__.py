"""Device-mesh parallelism utilities.

The reference has no in-process parallelism at all — ensembles fan out as
independent SLURM jobs and every trainer is single-GPU (SURVEY.md §2.13).
The TPU-native replacements built here:

- **replica parallelism**: shard the leading replica axis of an
  :class:`~molecular_dynamics_tpu.system.MDState` ensemble across an ICI
  mesh; each chip integrates its shard, no cross-replica communication
  (embarrassingly parallel, like the SLURM fan-out but one program),
- **data parallelism for training**: shard the batch axis and psum
  gradients across the mesh (``mdx.train``).
"""

from molecular_dynamics_tpu.parallel.mesh import (
    get_mesh,
    shard_ensemble,
    shard_batch,
    shard_campaign_advance,
    replicate_params,
)

__all__ = [
    "get_mesh",
    "shard_ensemble",
    "shard_batch",
    "shard_campaign_advance",
    "replicate_params",
]
