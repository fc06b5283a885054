"""viorb_tpu — a TPU-native visual-inertial SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
ORB-SLAM2/VIORB C++ reference (sta105/VIORB): ORB feature extraction and
Hamming matching, binary-BoW place recognition, IMU preintegration with
gravity/scale/bias initialization, PnP/Sim3 RANSAC, and visual-inertial
bundle adjustment as a batched Levenberg-Marquardt solver with
Schur-complement reduction over landmarks, shardable across TPU meshes.

Design: a functional core of pure jitted kernels over fixed-shape padded
arrays (features, matches, window states, factor blocks), with a thin host
orchestration layer replacing the reference's thread-and-mutex design
(reference: src/System.cc:240-271 thread spawn) with immutable snapshots.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry/estimation math is f32 and precision-critical: JAX's default
# matmul precision lowers f32 matmuls to bf16 passes, which measurably bends
# rotation chains (0.01 rad over 50 composes). Force exact f32 matmuls by
# default; throughput kernels (descriptor Hamming matmuls, Pallas) request
# bf16/MXU precision explicitly where it is safe.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: compiles of the big jitted pipelines take
# minutes over this environment's remote-compile TPU tunnel; cache them
# across processes.
import os as _os

# TPU (axon) only: XLA:CPU persists AOT-compiled machine code whose
# embedded machine-feature list (incl. pseudo-features like
# +prefer-no-scatter) does not round-trip reliably — a cached CPU run
# segfaulted inside backend_compile_and_load reproducibly, and the loader
# itself warns "could lead to execution errors such as SIGILL". The ~40%
# repeat-compile saving is not worth a crashing test suite; set
# VIORB_TPU_JAX_CACHE to opt in explicitly on CPU.
_platforms = _os.environ.get("JAX_PLATFORMS", "")
if "axon" in _platforms:
    _cache_dir = _os.environ.get(
        "VIORB_TPU_JAX_CACHE", "/root/repo/.jax_cache/axon"
    )
else:
    _cache_dir = _os.environ.get("VIORB_TPU_JAX_CACHE", "")
if _cache_dir:
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is an optimization only
        pass
