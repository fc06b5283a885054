"""Geometric estimation solvers: batched/vmapped RANSAC harnesses
(reference counterparts: Initializer, PnPsolver, Sim3Solver, and the
triangulation inside LocalMapping)."""

from viorb_tpu.solvers.triangulation import (
    triangulate_two_view,
    projection_matrix,
    parallax_cos,
)
from viorb_tpu.solvers.two_view import two_view_init, TwoViewResult
from viorb_tpu.solvers.pnp import pnp_ransac, PnPResult
from viorb_tpu.solvers.sim3_solver import sim3_ransac, horn_sim3, Sim3Result
