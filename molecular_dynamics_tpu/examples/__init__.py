"""Built-in example systems (self-contained, no external files needed)."""

from molecular_dynamics_tpu.examples.decaalanine import (
    decaalanine_backbone,
    BACKBONE_FF_PRM,
    BACKBONE_COLVAR,
)
from molecular_dynamics_tpu.examples.full_system import (
    decaalanine_full,
    dialanine,
    tiled_decaalanine,
)

__all__ = [
    "decaalanine_backbone",
    "BACKBONE_FF_PRM",
    "BACKBONE_COLVAR",
    "decaalanine_full",
    "dialanine",
    "tiled_decaalanine",
]
