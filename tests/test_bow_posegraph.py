"""BoW vocabulary/database and Sim3 pose-graph tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viorb_tpu.bow import BinaryVocabulary, KeyframeDatabase, train_vocabulary
from viorb_tpu.geometry.so3 import exp_so3
from viorb_tpu.geometry.sim3 import sim3_compose, sim3_inverse
from viorb_tpu.optim.pose_graph import Sim3Graph, optimize_sim3_graph


_PROTOS = None


def _prototypes():
    """Clustered descriptor space: 512 prototypes (real ORB descriptors
    cluster around visual-word archetypes; uniform random bits do not)."""
    global _PROTOS
    if _PROTOS is None:
        r = np.random.default_rng(1234)
        _PROTOS = r.integers(0, 2, size=(512, 256)).astype(np.uint8)
    return _PROTOS


def random_desc(rng, n, noise_bits=20):
    protos = _prototypes()
    idx = rng.integers(0, len(protos), n)
    d = protos[idx].copy()
    for i in range(n):
        flip = rng.choice(256, noise_bits, replace=False)
        d[i, flip] ^= 1
    return d


def perturb_desc(rng, d, bits):
    out = d.copy()
    for i in range(len(d)):
        idx = rng.choice(256, bits, replace=False)
        out[i, idx] ^= 1
    return out


@pytest.fixture(scope="module")
def vocab():
    rng = np.random.default_rng(0)
    return train_vocabulary(random_desc(rng, 5000), k=8, depth=3)


def test_vocab_transform_and_score(vocab, rng):
    d1 = random_desc(rng, 300)
    d1_noisy = perturb_desc(rng, d1, 12)  # same place, 12-bit noise
    d2 = random_desc(rng, 300)  # different place
    _, bow1 = vocab.transform(d1)
    _, bow1n = vocab.transform(d1_noisy)
    _, bow2 = vocab.transform(d2)
    s_same = BinaryVocabulary.score(bow1, bow1n)
    s_diff = BinaryVocabulary.score(bow1, bow2)
    s_self = BinaryVocabulary.score(bow1, bow1)
    assert s_self > 0.99
    assert s_same > s_diff * 1.5, (s_same, s_diff)


def test_vocab_save_load(vocab, tmp_path, rng):
    p = str(tmp_path / "voc.npz")
    vocab.save(p)
    v2 = BinaryVocabulary.load(p)
    d = random_desc(rng, 50)
    w1, _ = vocab.transform(d)
    w2, _ = v2.transform(d)
    np.testing.assert_array_equal(w1, w2)


def test_keyframe_database(vocab, rng):
    db = KeyframeDatabase(vocab)
    base = random_desc(rng, 200)
    bows = []
    for i in range(10):
        d = perturb_desc(rng, base, 40) if i == 7 else random_desc(rng, 200)
        _, bow = vocab.transform(d)
        db.add(i, bow)
        bows.append(bow)
    # query with a noisy copy of place 7
    _, qbow = vocab.transform(perturb_desc(rng, base, 20))
    res = db.query(qbow, exclude={9})
    assert res, "no candidates"
    assert res[0][0] == 7, res


def test_sim3_pose_graph_closes_loop(rng):
    """Odometry chain with accumulated drift + one loop edge: the graph
    must pull the end back to the start (the CorrectLoop -> essential
    graph flow, reference src/LoopClosing.cc:593)."""
    k = 20
    # ground truth: circle
    gt_s, gt_r, gt_t = [], [], []
    for i in range(k):
        ang = 2 * np.pi * i / k
        R = np.asarray(exp_so3(jnp.asarray([0.0, 0.0, ang], jnp.float32)))
        c = np.array([np.cos(ang), np.sin(ang), 0.0], np.float32) * 3.0
        # world->camera: R_cw = R^T, t = -R^T c
        gt_r.append(R.T)
        gt_t.append(-R.T @ c)
        gt_s.append(1.0)
    gt_r = np.stack(gt_r)
    gt_t = np.stack(gt_t)
    gt_s = np.array(gt_s, np.float32)

    # odometry with drift: relative measures exact, but integrated states
    # have noise + scale drift
    est_s = gt_s * np.exp(np.linspace(0, 0.15, k)).astype(np.float32)
    est_r = gt_r.copy()
    est_t = gt_t + rng.normal(size=(k, 3)).astype(np.float32) * np.linspace(
        0, 0.3, k
    ).reshape(-1, 1)

    # edges: consecutive from ESTIMATES' gt relatives (odometry is right),
    # plus loop edge k-1 -> 0
    ei, ej, ms, mr, mt, w = [], [], [], [], [], []

    def rel(a, b):  # S_ba = S_b * S_a^{-1} with gt
        inv = sim3_inverse(
            jnp.asarray(gt_s[a]), jnp.asarray(gt_r[a]), jnp.asarray(gt_t[a])
        )
        return sim3_compose(
            jnp.asarray(gt_s[b]), jnp.asarray(gt_r[b]), jnp.asarray(gt_t[b]), *inv
        )

    for i in range(k - 1):
        s_, r_, t_ = rel(i, i + 1)
        ei.append(i), ej.append(i + 1)
        ms.append(float(s_)), mr.append(np.asarray(r_)), mt.append(np.asarray(t_))
        w.append(1.0)
    s_, r_, t_ = rel(k - 1, 0)
    ei.append(k - 1), ej.append(0)
    ms.append(float(s_)), mr.append(np.asarray(r_)), mt.append(np.asarray(t_))
    w.append(1.0)

    graph = Sim3Graph(
        edge_i=jnp.asarray(np.array(ei, np.int32)),
        edge_j=jnp.asarray(np.array(ej, np.int32)),
        meas_s=jnp.asarray(np.array(ms, np.float32)),
        meas_r=jnp.asarray(np.stack(mr)),
        meas_t=jnp.asarray(np.stack(mt)),
        weight=jnp.asarray(np.array(w, np.float32)),
    )
    fixed = jnp.zeros(k, bool).at[0].set(True)
    s_o, r_o, t_o = optimize_sim3_graph(
        jnp.asarray(est_s), jnp.asarray(est_r), jnp.asarray(est_t), graph, fixed
    )
    # recovered states close to ground truth
    np.testing.assert_allclose(np.asarray(s_o), gt_s, rtol=0.02)
    np.testing.assert_allclose(np.asarray(r_o), gt_r, atol=0.03)
    np.testing.assert_allclose(np.asarray(t_o), gt_t, atol=0.1)
