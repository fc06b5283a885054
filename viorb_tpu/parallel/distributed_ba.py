"""Distributed Schur-complement bundle adjustment over a device mesh.

The reference has no distributed backend at all (SURVEY.md §2.3) — its
concurrency is 4 pthreads over shared memory. This module provides the
TPU-native scaling path (BASELINE.md north star: >=70% 2-host scaling
efficiency):

  * landmarks (and their observation rows) are SHARDED over the mesh's
    'lm' axis — each device eliminates its own landmark blocks locally
    (embarrassingly parallel Schur elimination);
  * the reduced camera system S (K*D x K*D) is small and REPLICATED:
    per-shard contributions are summed with one psum over ICI — the only
    collective in the iteration;
  * the damped Cholesky solve of S runs replicated on every device
    (cheaper than distributing a tiny solve);
  * landmark back-substitution is again local to each shard.

This is the classic "distribute the elimination, replicate the reduced
solve" layout; communication per iteration is exactly one all-reduce of
(K*D)^2 + K*D floats, independent of landmark count.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from viorb_tpu.geometry.camera import PinholeCamera
from viorb_tpu.optim.ba import (
    BAObservations,
    ImuChain,
    ViBAState,
    VisionBAState,
    _apply_vi_update,
    _apply_vision_update,
    _back_substitute,
    _schur_system,
    _solve_reduced,
    _vi_blocks,
    _vi_imu_system,
    _vision_blocks,
    _vision_cost_and_chi2,
)
from viorb_tpu.optim.robust import CHI2_MONO_2DOF, CHI2_VI_9DOF, huber_weight


def shard_observations(obs: BAObservations, mesh: Mesh):
    """Place the landmark-major grid with rows sharded over mesh axis 'lm'."""
    sh = NamedSharding(mesh, P("lm"))
    return BAObservations(
        kf_idx=jax.device_put(obs.kf_idx, sh),
        uv=jax.device_put(obs.uv, sh),
        inv_sigma2=jax.device_put(obs.inv_sigma2, sh),
        valid=jax.device_put(obs.valid, sh),
    )


def distributed_vision_ba(
    state: VisionBAState,
    obs: BAObservations,
    cam: PinholeCamera,
    fixed_kf: jax.Array,
    mesh: Mesh,
    iters: int = 10,
) -> Tuple[VisionBAState, jax.Array]:
    """Same semantics as optim.ba.vision_ba, landmark-sharded over
    mesh axis 'lm'. Poses are replicated; landmarks/obs sharded."""
    k = state.r_cw.shape[0]
    d = 6
    delta2 = CHI2_MONO_2DOF
    fixed_kd = jnp.repeat(fixed_kf, d)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(),  # r_cw (replicated)
            P(),  # t_cw
            P("lm"),  # points
            P("lm"),  # kf_idx
            P("lm"),  # uv
            P("lm"),  # inv_sigma2
            P("lm"),  # valid
            P(),  # lam
        ),
        out_specs=(P(), P(), P(), P("lm"), P("lm"), P("lm")),
    )
    def build_system(r_cw, t_cw, points, kf_idx, uv, inv_s2, valid, lam):
        st = VisionBAState(r_cw, t_cw, points)
        ob = BAObservations(kf_idx, uv, inv_s2, valid)
        r, Jp, Jl = _vision_blocks(st, ob, cam)
        chi2 = jnp.sum(r * r, axis=-1) * inv_s2
        hw = huber_weight(chi2, delta2)
        w = inv_s2 * hw * valid.astype(r.dtype)
        S, b, Hll_inv, b_l, U = _schur_system(r, Jp, Jl, w, ob, k, d, lam)
        # the ONLY collective: all-reduce the reduced camera system
        S = jax.lax.psum(S, "lm")
        b = jax.lax.psum(b, "lm")
        cost = jax.lax.psum(
            jnp.sum(jnp.where(valid, chi2 * jnp.minimum(hw, 1.0), 0.0)), "lm"
        )
        return S, b, cost, Hll_inv, b_l, U

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("lm"), P("lm"), P("lm"), P(), P("lm")),
        out_specs=P("lm"),
    )
    def back_sub(Hll_inv, b_l, U, dx, kf_idx):
        ob_kf = kf_idx
        dxp = dx.reshape(-1, d)[ob_kf]  # (m_local,R,D)
        rhs = b_l - jnp.einsum("mrij,mri->mj", U, dxp)
        return jnp.einsum("mij,mj->mi", Hll_inv, rhs)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P("lm"), P("lm"), P("lm"), P("lm"), P("lm")),
        out_specs=(P(), P("lm")),
    )
    def eval_cost(r_cw, t_cw, points, kf_idx, uv, inv_s2, valid):
        st = VisionBAState(r_cw, t_cw, points)
        ob = BAObservations(kf_idx, uv, inv_s2, valid)
        r, _, _ = _vision_blocks(st, ob, cam)
        chi2 = jnp.sum(r * r, axis=-1) * inv_s2
        hw = huber_weight(chi2, delta2)
        cost = jax.lax.psum(
            jnp.sum(jnp.where(valid, chi2 * jnp.minimum(hw, 1.0), 0.0)), "lm"
        )
        return cost, chi2

    @jax.jit
    def run(state, obs):
        def step(carry, _):
            state, lam = carry
            S, b, cost0, Hll_inv, b_l, U = build_system(
                state.r_cw, state.t_cw, state.points,
                obs.kf_idx, obs.uv, obs.inv_sigma2, obs.valid, lam,
            )
            dx = _solve_reduced(S, b, fixed_kd, lam)
            dl = back_sub(Hll_inv, b_l, U, dx, obs.kf_idx)
            cand = _apply_vision_update(state, dx, dl, k)
            cost1, _ = eval_cost(
                cand.r_cw, cand.t_cw, cand.points,
                obs.kf_idx, obs.uv, obs.inv_sigma2, obs.valid,
            )
            accept = cost1 < cost0
            state = jax.tree.map(lambda a, b: jnp.where(accept, a, b), cand, state)
            lam = jnp.where(
                accept, jnp.maximum(lam * 0.5, 1e-6), jnp.minimum(lam * 4.0, 1e4)
            )
            return (state, lam), cost1

        (state, _), costs = jax.lax.scan(
            step, (state, jnp.float32(1e-4)), None, length=iters
        )
        _, chi2 = eval_cost(
            state.r_cw, state.t_cw, state.points,
            obs.kf_idx, obs.uv, obs.inv_sigma2, obs.valid,
        )
        return state, chi2

    return run(state, obs)


def distributed_vi_ba(
    state: ViBAState,
    obs: BAObservations,
    cam: PinholeCamera,
    ext,
    chain: ImuChain,
    gravity: jax.Array,
    fixed_kf: jax.Array,
    mesh: Mesh,
    iters: int = 10,
) -> Tuple[ViBAState, jax.Array]:
    """Distributed VISUAL-INERTIAL BA: same semantics as optim.ba.vi_ba
    (15-DoF NavStates + preintegration/bias edges), landmark-sharded over
    mesh axis 'lm'.

    Layout: landmarks/observations sharded exactly as the vision variant;
    the IMU chain couples only the K replicated NavStates, so its dense
    (K,K,15,15) system is built REPLICATED on every device (it is tiny —
    K<=20 — and recomputing beats communicating). Communication per
    iteration stays one psum of the reduced camera system."""
    k = state.nav.p.shape[0]
    d = 15
    delta2 = CHI2_MONO_2DOF
    fixed_kd = jnp.repeat(fixed_kf, d)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(),  # nav (replicated pytree)
            P("lm"),  # points
            P("lm"),  # kf_idx
            P("lm"),  # uv
            P("lm"),  # inv_sigma2
            P("lm"),  # valid
            P(),  # lam
        ),
        out_specs=(P(), P(), P(), P("lm"), P("lm"), P("lm")),
    )
    def build_system(nav, points, kf_idx, uv, inv_s2, valid, lam):
        st = ViBAState(nav, points)
        ob = BAObservations(kf_idx, uv, inv_s2, valid)
        r, Jp, Jl = _vi_blocks(st, ob, cam, ext)
        chi2 = jnp.sum(r * r, axis=-1) * inv_s2
        hw = huber_weight(chi2, delta2)
        w = inv_s2 * hw * valid.astype(r.dtype)
        S, b, Hll_inv, b_l, U = _schur_system(r, Jp, Jl, w, ob, k, d, lam)
        S = jax.lax.psum(S, "lm")
        b = jax.lax.psum(b, "lm")
        cost = jax.lax.psum(
            jnp.sum(jnp.where(valid, chi2 * jnp.minimum(hw, 1.0), 0.0)), "lm"
        )
        # replicated IMU system (adds identically on every device)
        Himu, gimu, imu_cost = _vi_imu_system(nav, chain, gravity, k)
        S = S + Himu.transpose(0, 2, 1, 3).reshape(k * d, k * d)
        b = b + gimu.reshape(k * d)
        cost = cost + imu_cost
        return S, b, cost, Hll_inv, b_l, U

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("lm"), P("lm"), P("lm"), P(), P("lm")),
        out_specs=P("lm"),
    )
    def back_sub(Hll_inv, b_l, U, dx, kf_idx):
        dxp = dx.reshape(-1, d)[kf_idx]
        rhs = b_l - jnp.einsum("mrij,mri->mj", U, dxp)
        return jnp.einsum("mij,mj->mi", Hll_inv, rhs)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P("lm"), P("lm"), P("lm"), P("lm"), P("lm")),
        out_specs=(P(), P("lm")),
    )
    def eval_cost(nav, points, kf_idx, uv, inv_s2, valid):
        st = ViBAState(nav, points)
        ob = BAObservations(kf_idx, uv, inv_s2, valid)
        r, _, _ = _vi_blocks(st, ob, cam, ext)
        chi2 = jnp.sum(r * r, axis=-1) * inv_s2
        hw = huber_weight(chi2, delta2)
        cost = jax.lax.psum(
            jnp.sum(jnp.where(valid, chi2 * jnp.minimum(hw, 1.0), 0.0)), "lm"
        )
        _, _, imu_cost = _vi_imu_system(nav, chain, gravity, k)
        return cost + imu_cost, chi2

    @jax.jit
    def run(state, obs):
        def step(carry, _):
            state, lam = carry
            S, b, cost0, Hll_inv, b_l, U = build_system(
                state.nav, state.points,
                obs.kf_idx, obs.uv, obs.inv_sigma2, obs.valid, lam,
            )
            dx = _solve_reduced(S, b, fixed_kd, lam)
            dl = back_sub(Hll_inv, b_l, U, dx, obs.kf_idx)
            cand = _apply_vi_update(state, dx, dl, k)
            cost1, _ = eval_cost(
                cand.nav, cand.points,
                obs.kf_idx, obs.uv, obs.inv_sigma2, obs.valid,
            )
            accept = cost1 < cost0
            state = jax.tree.map(lambda a, b: jnp.where(accept, a, b), cand, state)
            lam = jnp.where(
                accept, jnp.maximum(lam * 0.5, 1e-6), jnp.minimum(lam * 4.0, 1e4)
            )
            return (state, lam), cost1

        (state, _), _ = jax.lax.scan(
            step, (state, jnp.float32(1e-4)), None, length=iters
        )
        _, chi2 = eval_cost(
            state.nav, state.points,
            obs.kf_idx, obs.uv, obs.inv_sigma2, obs.valid,
        )
        return state, chi2

    return run(state, obs)
