"""Auxiliary subsystems: profiling, trajectory IO (SURVEY.md §5)."""

from hectr_tpu.utils.pmu import Timer, timed
from hectr_tpu.utils.trajio import (
    read_traj_bin,
    traj_compare,
    write_traj_bin,
    write_traj_txt,
)

__all__ = [
    "Timer", "timed",
    "write_traj_txt", "write_traj_bin", "read_traj_bin", "traj_compare",
]
