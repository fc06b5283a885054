"""Multi-host (DCN) launch helpers for the distributed BA path.

The reference has no multi-node story at all (SURVEY.md §2.3); this is the
TPU-native one. A multi-host run is the SAME single program as the
single-host path — `jax.distributed.initialize` joins the hosts, the mesh
spans every chip in the slice/pod, and the landmark-sharded BA's one psum
per iteration rides ICI within a slice and DCN across slices. Nothing in
distributed_ba.py changes: shard_map addresses the global mesh.

Mesh layout policy: the 'lm' (landmark) axis is laid out with the
FASTEST-varying dimension over the chips of one host/slice so the psum's
ring reduction does the bulk of its hops over ICI and only one
segment-sum per slice crosses DCN (the scaling-book recipe: shard the
big, bandwidth-hungry axis over ICI; put only low-frequency traffic on
DCN).

Usage (one process per host):

    from viorb_tpu.parallel.multihost import initialize, landmark_mesh
    initialize(coordinator="10.0.0.1:8476", num_processes=2, process_id=i)
    mesh = landmark_mesh()           # global mesh over all hosts' chips
    obs = shard_observations(obs, mesh)   # global-view arrays
    out, chi2 = distributed_vision_ba(state, obs, cam, fixed, mesh)

This environment has one tunneled chip and no second host, so
initialize() is exercised only in its no-op single-process form; the mesh
construction and order policy are unit-tested on the virtual CPU mesh.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Join a multi-process JAX run (DCN). With no arguments this reads
    the standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID) and is a no-op when they are absent (single host,
    e.g. this environment's single tunneled chip)."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if coordinator is None or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def landmark_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D 'lm' mesh over all devices, ordered host-major so that
    consecutive mesh positions are chips of the same host: the psum's
    neighbor exchanges then run over ICI, with one DCN hop per host
    boundary rather than interleaved DCN traffic."""
    devices = list(jax.devices()) if devices is None else list(devices)
    devices = sorted(
        devices, key=lambda d: (d.process_index, getattr(d, "id", 0))
    )
    return Mesh(np.array(devices), ("lm",))


def host_local_slice(n_items: int, mesh: Mesh) -> slice:
    """The block of a globally lm-sharded, length-n_items array that this
    process owns (for building global arrays with
    jax.make_array_from_process_local_data-style feeding). Rows divide
    evenly across mesh devices; devices of one process are contiguous by
    landmark_mesh construction."""
    devs = list(mesh.devices.ravel())
    n_dev = len(devs)
    assert n_items % n_dev == 0, (n_items, n_dev)
    per = n_items // n_dev
    mine = [i for i, d in enumerate(devs) if d.process_index == jax.process_index()]
    if not mine:
        return slice(0, 0)
    assert mine == list(range(mine[0], mine[0] + len(mine))), (
        "landmark_mesh orders devices host-major; got interleaved hosts"
    )
    return slice(mine[0] * per, (mine[-1] + 1) * per)
