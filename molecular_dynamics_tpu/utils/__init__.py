"""Miscellaneous utilities (visualisation glue, timers)."""

from molecular_dynamics_tpu.utils.vmd import write_vmd_loader

__all__ = ["write_vmd_loader"]
