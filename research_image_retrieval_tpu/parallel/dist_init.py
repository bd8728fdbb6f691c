"""Multi-host initialization helpers.

Replaces the reference's NCCL process-group bootstrap
(reference: utils/helpfunc.py:136-171 init_distributed_mode +
setup_for_distributed): under JAX a single ``jax.distributed.initialize``
per host replaces rendezvous/barrier/process-group management; collectives
come from pjit/shard_map.  Environment handling mirrors the reference's
env-var and SLURM paths.
"""

from __future__ import annotations

import builtins
import os

import jax

__all__ = [
    "init_distributed_mode",
    "is_main_process",
    "get_rank",
    "get_world_size",
    "setup_for_distributed",
]


def init_distributed_mode(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    quiet_non_main: bool = True,
) -> bool:
    """Initialize multi-host JAX if the environment requests it.

    Resolution order mirrors the reference (helpfunc.py:152-158): explicit
    args, then RANK/WORLD_SIZE env, then SLURM_PROCID; otherwise single-
    process mode (returns False, like the reference's early return).
    """
    if num_processes is None:
        if "WORLD_SIZE" in os.environ:
            num_processes = int(os.environ["WORLD_SIZE"])
            process_id = int(os.environ.get("RANK", 0))
        elif "SLURM_NTASKS" in os.environ and "SLURM_PROCID" in os.environ:
            num_processes = int(os.environ["SLURM_NTASKS"])
            process_id = int(os.environ["SLURM_PROCID"])
        else:
            print("Not using distributed mode")
            return False
    if num_processes <= 1:
        return False
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS", os.environ.get("MASTER_ADDR", "localhost") + ":"
        + os.environ.get("MASTER_PORT", "1234")
    )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    if quiet_non_main:
        setup_for_distributed(is_main_process())
    print(
        f"| distributed init: process {jax.process_index()}/"
        f"{jax.process_count()}, {len(jax.local_devices())} local devices"
    )
    return True


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def setup_for_distributed(is_master: bool):
    """Suppress print on non-master hosts (reference: helpfunc.py:136-148)."""
    builtin_print = builtins.print

    def print_(*args, **kwargs):
        force = kwargs.pop("force", False)
        if is_master or force:
            builtin_print(*args, **kwargs)

    builtins.print = print_
