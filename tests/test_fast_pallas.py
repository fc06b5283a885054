"""The Pallas FAST kernel must produce EXACTLY the jnp formulation's
score map (same min/max reduction tree; borders zeroed identically).
Runs in Pallas interpret mode so the equivalence holds on CPU CI too."""

import jax.numpy as jnp
import numpy as np

from viorb_tpu.features.fast import _fast_score_map_jnp
from viorb_tpu.features.fast_pallas import fast_score_map_pallas


def test_pallas_fast_matches_jnp():
    rng = np.random.default_rng(0)
    for h, w in ((480, 752), (97, 130), (64, 128)):
        img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
        ref = np.asarray(_fast_score_map_jnp(img))
        out = np.asarray(fast_score_map_pallas(img, interpret=True))
        np.testing.assert_array_equal(out, ref)


def test_pallas_fast_detects_synthetic_corner():
    img = np.full((64, 128), 50.0, np.float32)
    img[20:, 40:] = 200.0  # a bright quadrant corner at (20,40)
    out = np.asarray(fast_score_map_pallas(jnp.asarray(img), interpret=True))
    y, x = np.unravel_index(np.argmax(out), out.shape)
    assert abs(y - 20) <= 2 and abs(x - 40) <= 2, (y, x)
    assert out.max() > 100.0
