"""Loss/metric parity tests (gcn/metrics.py semantics)."""

import numpy as np
import jax.numpy as jnp

from distgcn_tpu.rl import losses


def test_softmax_ce_matches_manual(rng):
    logits = rng.standard_normal((10, 2)).astype(np.float32)
    labels = np.eye(2)[rng.integers(0, 2, 10)].astype(np.float32)
    got = float(losses.softmax_cross_entropy(jnp.asarray(logits),
                                             jnp.asarray(labels)))
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    want = -np.mean(np.sum(labels * np.log(p), -1))
    assert abs(got - want) < 1e-5


def test_weighted_ce_weighting(rng):
    logits = rng.standard_normal((6, 2)).astype(np.float32)
    labels = np.eye(2)[rng.integers(0, 2, 6)].astype(np.float32)
    w = np.ones(6, np.float32)
    a = float(losses.softmax_cross_entropy(jnp.asarray(logits),
                                           jnp.asarray(labels)))
    b = float(losses.weighted_softmax_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w)))
    assert abs(a - b) < 1e-6  # uniform weights reduce to plain CE


def test_accuracy_f1():
    logits = jnp.asarray([[2.0, 1.0], [0.0, 3.0], [5.0, 0.0], [0.0, 1.0]])
    labels = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [0.0, 1.0], [0.0, 1.0]])
    assert float(losses.accuracy(logits, labels)) == 0.75
    f1 = float(losses.f1_score(logits, labels))
    # tp=2 (rows 1,3), fp=0, fn=1 (row 2) -> P=1, R=2/3, F1=0.8
    assert abs(f1 - 0.8) < 1e-6


def test_hindsight_min_takes_best_head(rng):
    n, d = 8, 3
    labels = rng.integers(0, 2, n).astype(np.float32)
    w = np.ones(n, np.float32)
    # head 1 perfectly confident & correct; others random. Reference layout:
    # head k at the interleaved column pair (2k, 2k+1) (gcn/models.py:330).
    logits = rng.standard_normal((n, 2 * d)).astype(np.float32)
    logits[:, 2] = -100 * (2 * labels - 1)        # neg logit, head k=1
    logits[:, 3] = 100 * (2 * labels - 1)         # pos logit, head k=1
    loss = float(losses.hindsight_diver_ce(jnp.asarray(logits),
                                           jnp.asarray(labels),
                                           jnp.asarray(w), d))
    assert loss < 1e-4
    # max-over-heads metrics (gcn/models.py:344-361) pick the perfect head
    acc = float(losses.hindsight_diver_accuracy(jnp.asarray(logits),
                                                jnp.asarray(labels), d))
    assert acc == 1.0
    f1, prec, rec = losses.hindsight_diver_f1(jnp.asarray(logits),
                                              jnp.asarray(labels), d)
    if labels.sum() > 0:          # F1 defined only with positives present
        assert float(f1) == 1.0 and float(prec) == 1.0 and float(rec) == 1.0


def test_f1_precision_recall_triple():
    logits = jnp.asarray([[2.0, 1.0], [0.0, 3.0], [5.0, 0.0], [0.0, 1.0]])
    labels = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [0.0, 1.0], [0.0, 1.0]])
    f1, p, r = losses.f1_precision_recall(logits, labels)
    # tp=2 (rows 1,3), fp=0, fn=1 (row 2) -> P=1, R=2/3, F1=0.8
    assert abs(float(p) - 1.0) < 1e-6
    assert abs(float(r) - 2.0 / 3.0) < 1e-6
    assert abs(float(f1) - 0.8) < 1e-6


def test_gcn_dqn_loss_min_over_heads(rng):
    labels = rng.standard_normal((10, 1)).astype(np.float32)
    out = np.concatenate([labels + 1.0, labels], axis=1)  # head1 exact
    loss = float(losses.gcn_dqn_loss(jnp.asarray(out), jnp.asarray(labels),
                                     diver_num=2))
    assert loss < 1e-6
    loss1 = float(losses.gcn_dqn_loss(jnp.asarray(out[:, :1]),
                                      jnp.asarray(labels), diver_num=1))
    assert abs(loss1 - 1.0) < 1e-5


def test_step_timer():
    from distgcn_tpu.utils.profiling import StepTimer, emv
    t = StepTimer("x")
    with t:
        pass
    t.add(graphs=10, edges=100)
    assert t.count == 1 and t.graphs == 10
    assert emv(1.0, None) == 1.0
    assert abs(emv(1.0, 0.0) - 0.5) < 1e-9
