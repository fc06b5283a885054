"""Robust kernels and chi2 gates (reference: g2o Huber kernels,
Thirdparty/g2o/g2o/core/robust_kernel_impl.cpp; thresholds as used in
src/Optimizer.cc — 5.991 mono 2-dof, 16.919 chi2(0.95,9dof) VI edges,
sqrt(21.666) at 0.99)."""

from __future__ import annotations

import jax.numpy as jnp

CHI2_MONO_2DOF = 5.991
CHI2_STEREO_3DOF = 7.815
CHI2_VI_9DOF = 16.919
CHI2_VI_9DOF_99 = 21.666


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight for the Huber kernel: 1 inside, delta/|r| outside.

    chi2 is the squared whitened residual norm; delta2 the squared
    threshold.
    """
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))
