"""FAST corner score map as a Pallas TPU kernel.

The jnp formulation (features/fast.py) materializes the 16-neighbour
stack and its rolled-min pyramid as (16,H,W) HBM intermediates — ~20
passes over the image. This kernel keeps the padded image resident in
VMEM, streams row chunks through registers, and writes the score map
once: HBM traffic drops to read-image + write-score.

Bit-compatible with fast.fast_score_map: identical min/max reduction
tree (exact ops), identical border handling; verified by
tests/test_fast_pallas.py in interpret mode and used on the TPU backend
automatically (features/fast.py dispatch).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from viorb_tpu.features.fast import ARC_LEN, CIRCLE_OFFSETS

_CHUNK = 64  # rows per grid step
_PAD = 3  # circle radius


def _fast_kernel(img_ref, out_ref, *, h_pad: int, w_pad: int):
    """img_ref: (h_pad+6, w_pad+6) padded image (VMEM, whole array);
    out_ref: (h_pad, w_pad) score map. Grid over row chunks."""
    i = pl.program_id(0)
    row0 = i * _CHUNK
    img = img_ref[pl.ds(row0, _CHUNK + 2 * _PAD), :]
    c = img[_PAD : _PAD + _CHUNK, _PAD : _PAD + w_pad]
    bright = []
    for dy, dx in CIRCLE_OFFSETS:
        n = img[_PAD + dy : _PAD + dy + _CHUNK, _PAD + dx : _PAD + dx + w_pad]
        bright.append(n - c)

    def arc(d):
        # min over ARC_LEN=9 consecutive circle positions (8+1 log-steps),
        # then max over the 16 windows — same tree as fast.fast_score_map
        m2 = [jnp.minimum(d[k], d[(k + 1) % 16]) for k in range(16)]
        m4 = [jnp.minimum(m2[k], m2[(k + 2) % 16]) for k in range(16)]
        m8 = [jnp.minimum(m4[k], m4[(k + 4) % 16]) for k in range(16)]
        m9 = [jnp.minimum(m8[k], d[(k + 8) % 16]) for k in range(16)]
        out = m9[0]
        for k in range(1, 16):
            out = jnp.maximum(out, m9[k])
        return out

    dark = [-b for b in bright]
    score = jnp.maximum(jnp.maximum(arc(bright), arc(dark)), 0.0)
    out_ref[pl.ds(row0, _CHUNK), :] = score


@partial(jax.jit, static_argnames=("interpret",))
def fast_score_map_pallas(image: jax.Array, interpret: bool = False) -> jax.Array:
    """(H,W) f32 -> (H,W) f32 corner score; 3 px border zeroed (the rolled
    neighbours wrap there in the reference formulation, so both versions
    zero it)."""
    h, w = image.shape
    h_pad = pl.cdiv(h, _CHUNK) * _CHUNK
    w_pad = pl.cdiv(w, 128) * 128
    img_p = jnp.zeros((h_pad + 2 * _PAD, w_pad + 2 * _PAD), image.dtype)
    img_p = jax.lax.dynamic_update_slice(img_p, image, (_PAD, _PAD))
    out = pl.pallas_call(
        partial(_fast_kernel, h_pad=h_pad, w_pad=w_pad),
        out_shape=jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
        grid=(h_pad // _CHUNK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(img_p)
    score = out[:h, :w]
    score = score.at[:_PAD, :].set(0.0).at[-_PAD:, :].set(0.0)
    score = score.at[:, :_PAD].set(0.0).at[:, -_PAD:].set(0.0)
    return score
