"""VMD visualisation glue.

The reference ships a ``loadall.tcl`` in every cGAN experiment dir
(cGAN/cGAN_D_pos-2.2.4/loadall.tcl:1-36) that loads the topology plus the
generated/pretrain xyz trajectories for qualitative inspection. This writes
the equivalent loader for this framework's artifacts.
"""

from __future__ import annotations

from typing import Optional, Sequence


def write_vmd_loader(
    path: str,
    trajectories: Sequence[str],
    topology: Optional[str] = None,
    representation: str = "Licorice",
):
    """Write a ``loadall.tcl``; run with ``vmd -e loadall.tcl``."""
    lines = []
    if topology:
        lines.append(f"mol new {{{topology}}} waitfor all")
        first_load = "mol addfile"
    else:
        first_load = "mol new"
    for i, traj in enumerate(trajectories):
        cmd = first_load if (topology and i == 0) else "mol new"
        lines.append(f"{cmd} {{{traj}}} waitfor all")
    lines += [
        "mol delrep 0 top",
        f"mol representation {representation}",
        "mol addrep top",
        "display projection Orthographic",
        "color Display Background white",
    ]
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return path
