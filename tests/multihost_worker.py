"""Worker process for the 2-process DCN test (spawned by
test_multihost_spawn.py; not collected by pytest).

Each process joins a jax.distributed run over 127.0.0.1, contributes 4
virtual CPU devices to a global 8-device 'lm' mesh, feeds its host-local
landmark rows, runs the distributed landmark-sharded vision BA, and
compares the (replicated) solved poses against a locally-computed
single-device solve of the same seeded problem."""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", ""
    )
    + " --xla_force_host_platform_device_count=4"
).strip()

# jax.distributed.initialize must run BEFORE anything touches the XLA
# backend — importing viorb_tpu does (module-level jnp constants). Load
# the multihost helpers standalone to keep the real initialize() under
# test without dragging the package in first.
import importlib.util  # noqa: E402

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "mh", os.path.join(_repo, "viorb_tpu", "parallel", "multihost.py")
)
mh = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(mh)

_ok = mh.initialize(
    coordinator=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)
assert _ok, "initialize() returned False with a coordinator configured"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from viorb_tpu.geometry.camera import PinholeCamera, project  # noqa: E402
from viorb_tpu.geometry.so3 import exp_so3  # noqa: E402
from viorb_tpu.optim import BAObservations, VisionBAState, vision_ba  # noqa: E402
from viorb_tpu.parallel import (  # noqa: E402
    distributed_vision_ba,
    host_local_slice,
    landmark_mesh,
)

CAM = PinholeCamera(fx=450.0, fy=450.0, cx=376.0, cy=240.0)


def build_problem(rng, k=6, m=256, noise=0.3):
    pts = np.stack(
        [rng.uniform(-4, 4, m), rng.uniform(-3, 3, m), rng.uniform(4, 10, m)], 1
    ).astype(np.float32)
    Rs, ts, uvs = [], [], []
    for i in range(k):
        Rk = np.asarray(exp_so3(jnp.asarray(rng.normal(size=3) * 0.02)))
        tk = np.array([-0.25 * i, 0.01 * i, 0.0], np.float32)
        pc = pts @ Rk.T + tk
        uv = np.asarray(project(CAM, jnp.asarray(pc))).copy()
        uv += rng.normal(size=uv.shape) * noise
        Rs.append(Rk)
        ts.append(tk)
        uvs.append(uv.astype(np.float32))
    return pts, np.stack(Rs), np.stack(ts), np.stack(uvs, 1)


def main():
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())

    rng = np.random.default_rng(0)  # SAME seed in every process
    k, m = 6, 256
    pts, Rs, ts, uvs = build_problem(rng, k, m)
    R0, t0 = Rs.copy(), ts.copy()
    for i in range(1, k):
        R0[i] = np.asarray(exp_so3(jnp.asarray(rng.normal(size=3) * 0.01))) @ Rs[i]
        t0[i] = ts[i] + rng.normal(size=3).astype(np.float32) * 0.05
    p0 = (pts + rng.normal(size=pts.shape).astype(np.float32) * 0.05).astype(
        np.float32
    )
    kf_idx = np.tile(np.arange(k, dtype=np.int32), (m, 1))
    inv_s2 = np.ones((m, k), np.float32)
    valid = np.ones((m, k), bool)
    fixed = jnp.zeros(k, bool).at[0].set(True)

    # local single-device reference solve (plain jit on this process's
    # first local device; identical in both processes — same seed)
    obs_local = BAObservations(
        kf_idx=jnp.asarray(kf_idx), uv=jnp.asarray(uvs),
        inv_sigma2=jnp.asarray(inv_s2), valid=jnp.asarray(valid),
    )
    state_local = VisionBAState(jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(p0))
    out_s, chi2_s = vision_ba(state_local, obs_local, CAM, fixed, iters=10)
    r_ref = np.asarray(out_s.r_cw)
    t_ref = np.asarray(out_s.t_cw)

    # global mesh across BOTH processes; feed host-local landmark rows
    mesh = landmark_mesh()
    sh = NamedSharding(mesh, P("lm"))
    repl = NamedSharding(mesh, P())
    sl = host_local_slice(m, mesh)

    def gshard(x):
        return jax.make_array_from_process_local_data(sh, np.asarray(x)[sl])

    def grepl(x):
        return jax.make_array_from_process_local_data(repl, np.asarray(x))

    obs_d = BAObservations(
        kf_idx=gshard(kf_idx), uv=gshard(uvs),
        inv_sigma2=gshard(inv_s2), valid=gshard(valid),
    )
    state_d = VisionBAState(grepl(R0), grepl(t0), gshard(p0))
    out_d, chi2_d = distributed_vision_ba(state_d, obs_d, CAM, fixed, mesh, iters=10)

    r_d = np.asarray(jax.device_get(out_d.r_cw))
    t_d = np.asarray(jax.device_get(out_d.t_cw))
    dr = float(np.abs(r_d - r_ref).max())
    dt = float(np.abs(t_d - t_ref).max())
    assert dr < 1e-4 and dt < 1e-3, (dr, dt)
    print(f"MULTIHOST_OK pid={pid} dr={dr:.2e} dt={dt:.2e}", flush=True)


if __name__ == "__main__":
    main()
