"""Multi-chip distribution: landmark-sharded Schur-complement BA over a
jax.sharding.Mesh (SURVEY.md §2.3 / §7 step 8 — the capability the
reference lacks entirely)."""

from viorb_tpu.parallel.distributed_ba import (
    distributed_vi_ba,
    distributed_vision_ba,
    shard_observations,
)
from viorb_tpu.parallel.multihost import (
    host_local_slice,
    initialize,
    landmark_mesh,
)
