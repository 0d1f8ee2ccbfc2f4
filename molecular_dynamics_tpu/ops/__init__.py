"""Pallas TPU kernels for the hot compute paths."""

from molecular_dynamics_tpu.ops.nonbonded import make_nonbonded_op

__all__ = ["make_nonbonded_op"]
