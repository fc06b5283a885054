"""Sim3 pose-graph (essential graph) optimization.

Counterpart of Optimizer::OptimizeEssentialGraph (reference:
src/Optimizer.cc:4313 — Sim3 vertices per keyframe, edges from the
spanning tree, covisibility (>=100 weight), and loop closures; mono scale
free). Residual per edge: e = Log(S_ji_meas * S_i * S_j^{-1}) (7-dim),
Jacobians by forward-mode autodiff at zero local increment, dense damped
GN over all 7K states (K<=few hundred -> tiny solve).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from viorb_tpu.geometry.sim3 import (
    exp_sim3,
    log_sim3,
    sim3_compose,
    sim3_inverse,
)


class Sim3Graph(NamedTuple):
    """edges i->j with measured relative transform S_ji = S_j * S_i^{-1}.

    edge_i/j: (E,) int32; meas_s: (E,), meas_r: (E,3,3), meas_t: (E,3);
    weight: (E,) f32 (0 for padding).
    """

    edge_i: jax.Array
    edge_j: jax.Array
    meas_s: jax.Array
    meas_r: jax.Array
    meas_t: jax.Array
    weight: jax.Array


def _edge_residual(di, dj, si, ri, ti, sj, rj, tj, ms, mr, mt):
    """e = log( S_ji_meas * (exp(di) Si) * (exp(dj) Sj)^{-1} )."""
    esi, eri, eti = exp_sim3(di)
    s_i, r_i, t_i = sim3_compose(esi, eri, eti, si, ri, ti)
    esj, erj, etj = exp_sim3(dj)
    s_j, r_j, t_j = sim3_compose(esj, erj, etj, sj, rj, tj)
    inv = sim3_inverse(s_j, r_j, t_j)
    rel = sim3_compose(ms, mr, mt, *sim3_compose(s_i, r_i, t_i, *inv))
    return log_sim3(*rel)


@partial(jax.jit, static_argnames=("iters", "fix_scale"))
def optimize_sim3_graph(
    s: jax.Array,  # (K,) scales (Scw convention: world->camera)
    r: jax.Array,  # (K,3,3)
    t: jax.Array,  # (K,3)
    graph: Sim3Graph,
    fixed: jax.Array,  # (K,) bool
    iters: int = 20,
    fix_scale: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """fix_scale pins every vertex's sigma dof (SE3-in-Sim3 graph — the
    reference's bFixScale essential graph for stereo/RGB-D,
    src/Optimizer.cc OptimizeEssentialGraph)."""
    k = s.shape[0]
    d = 7
    z7 = jnp.zeros(7, jnp.float32)
    fixed_kd = jnp.repeat(fixed, d)
    if fix_scale:
        fixed_kd = fixed_kd | (jnp.arange(k * d) % d == 6)

    def system(s, r, t):
        si = s[graph.edge_i]
        ri = r[graph.edge_i]
        ti = t[graph.edge_i]
        sj = s[graph.edge_j]
        rj = r[graph.edge_j]
        tj = t[graph.edge_j]

        def per_edge(si, ri, ti, sj, rj, tj, ms, mr, mt):
            f = lambda di, dj: _edge_residual(
                di, dj, si, ri, ti, sj, rj, tj, ms, mr, mt
            )
            res = f(z7, z7)
            Ji = jax.jacfwd(f, argnums=0)(z7, z7)
            Jj = jax.jacfwd(f, argnums=1)(z7, z7)
            return res, Ji, Jj

        res, Ji, Jj = jax.vmap(per_edge)(
            si, ri, ti, sj, rj, tj, graph.meas_s, graph.meas_r, graph.meas_t
        )
        w = graph.weight
        H = jnp.zeros((k, k, d, d), jnp.float32)
        g = jnp.zeros((k, d), jnp.float32)
        wJi = Ji * w[:, None, None]
        wJj = Jj * w[:, None, None]
        H = H.at[graph.edge_i, graph.edge_i].add(jnp.einsum("eci,ecj->eij", wJi, Ji))
        H = H.at[graph.edge_i, graph.edge_j].add(jnp.einsum("eci,ecj->eij", wJi, Jj))
        H = H.at[graph.edge_j, graph.edge_i].add(jnp.einsum("eci,ecj->eij", wJj, Ji))
        H = H.at[graph.edge_j, graph.edge_j].add(jnp.einsum("eci,ecj->eij", wJj, Jj))
        g = g.at[graph.edge_i].add(-jnp.einsum("eci,ec->ei", wJi, res))
        g = g.at[graph.edge_j].add(-jnp.einsum("eci,ec->ei", wJj, res))
        cost = jnp.sum(w * jnp.sum(res * res, axis=-1))
        return H, g, cost

    def step(carry, _):
        s, r, t, lam = carry
        H, g, cost0 = system(s, r, t)
        Hd = H.transpose(0, 2, 1, 3).reshape(k * d, k * d)
        gd = g.reshape(k * d)
        Hd = Hd + lam * jnp.diag(jnp.maximum(jnp.diagonal(Hd), 1e-6))
        free = ~fixed_kd
        Hm = jnp.where(free[:, None] & free[None, :], Hd, 0.0)
        Hm = Hm + jnp.diag(jnp.where(fixed_kd, 1.0, 1e-8))
        gm = jnp.where(free, gd, 0.0)
        dx = jnp.linalg.solve(Hm, gm).reshape(k, d)
        es, er, et = exp_sim3(dx)
        s_n, r_n, t_n = sim3_compose(es, er, et, s, r, t)
        _, _, cost1 = system(s_n, r_n, t_n)
        acc = cost1 < cost0
        s = jnp.where(acc, s_n, s)
        r = jnp.where(acc, r_n, r)
        t = jnp.where(acc, t_n, t)
        lam = jnp.where(acc, jnp.maximum(lam * 0.5, 1e-8), jnp.minimum(lam * 4, 1e6))
        return (s, r, t, lam), cost1

    (s, r, t, _), _ = jax.lax.scan(
        step, (s, r, t, jnp.float32(1e-6)), None, length=iters
    )
    return s, r, t
