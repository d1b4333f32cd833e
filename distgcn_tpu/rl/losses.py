"""Losses and metrics — parity with gcn/metrics.py and the model losses.

- softmax CE / node-weighted CE (gcn/metrics.py:3-16)
- accuracy / F1 (+ masked variants) (gcn/metrics.py:19-62)
- hindsight-min diver CE: GCN_DEEP_DIVER trains 2-class heads and
  backpropagates only the best head (gcn/models.py:327-334)
- RMSE Q-losses: GCN_DQN head-0 RMSE + min-over-extra-heads L1
  (gcn/models.py:462-479), GCN2_DQN scalar RMSE (gcn/models.py:613-626)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_cross_entropy(logits, labels):
    """Mean softmax CE (gcn/metrics.py:3-8). labels one-hot [..., C]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(labels * logp, axis=-1))


def weighted_softmax_cross_entropy(logits, labels, node_weights):
    """Node-weight-normalized CE (gcn/metrics.py:10-16): per-node CE scaled
    by w / mean(w)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(labels * logp, axis=-1)
    w = node_weights / jnp.maximum(jnp.mean(node_weights), 1e-12)
    return jnp.mean(ce * w)


def accuracy(logits, labels):
    """Argmax accuracy (gcn/metrics.py:19-23)."""
    return jnp.mean((jnp.argmax(logits, -1) == jnp.argmax(labels, -1))
                    .astype(jnp.float32))


def f1_score(logits, labels, positive_class: int = 1):
    """Precision/recall F1 from argmax (gcn/metrics.py:26-43)."""
    pred = jnp.argmax(logits, -1) == positive_class
    true = jnp.argmax(labels, -1) == positive_class
    tp = jnp.sum(pred & true)
    fp = jnp.sum(pred & ~true)
    fn = jnp.sum(~pred & true)
    precision = tp / jnp.maximum(tp + fp, 1)
    recall = tp / jnp.maximum(tp + fn, 1)
    return 2 * precision * recall / jnp.maximum(precision + recall, 1e-12)


def f1_precision_recall(logits, labels):
    """The reference's exact my_f1 triple (gcn/metrics.py:26-43): tp/fp/fn
    as MEANS over nodes (not counts — same ratios), precision/recall/F1 from
    them. An epsilon guards the 0/0 cases the reference leaves as nan."""
    correct = jnp.argmax(logits, -1) == jnp.argmax(labels, -1)
    pos = labels[..., 1] > 0
    neg = labels[..., 0] > 0
    tp = jnp.mean((correct & pos).astype(jnp.float32))
    fp = jnp.mean((~correct & neg).astype(jnp.float32))
    fn = jnp.mean((~correct & pos).astype(jnp.float32))
    precision = tp / jnp.maximum(tp + fp, 1e-12)
    recall = tp / jnp.maximum(tp + fn, 1e-12)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-12)
    return f1, precision, recall


def masked_softmax_cross_entropy(logits, labels, mask):
    """CE over masked nodes (gcn/metrics.py:46-53)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(labels * logp, axis=-1)
    m = mask.astype(jnp.float32)
    m = m / jnp.maximum(jnp.mean(m), 1e-12)
    return jnp.mean(ce * m)


def masked_accuracy(logits, labels, mask):
    """gcn/metrics.py:56-62."""
    correct = (jnp.argmax(logits, -1) == jnp.argmax(labels, -1)) \
        .astype(jnp.float32)
    m = mask.astype(jnp.float32)
    m = m / jnp.maximum(jnp.mean(m), 1e-12)
    return jnp.mean(correct * m)


def diver_heads(logits, diver_num: int):
    """Reference diver head layout (gcn/models.py:330-332, :398-400): head k
    occupies the INTERLEAVED column pair (2k, 2k+1) — class 0 (out of IS) at
    even, class 1 (in IS) at odd columns. Returns [..., diver, 2]."""
    return logits[..., : 2 * diver_num].reshape(
        logits.shape[:-1] + (diver_num, 2))


def hindsight_diver_ce(logits, labels01, node_weights, diver_num: int):
    """GCN_DEEP_DIVER hindsight loss (gcn/models.py:327-334): the 2*diver
    logits form diver_num (neg, pos) heads at interleaved column pairs
    (`diver_heads`); each head incurs a weighted CE against the 0/1 IS
    labels; only the minimum-loss head counts.

    logits: [N, 2*diver]; labels01: [N] in {0,1}; node_weights: [N].
    """
    onehot = jnp.stack([1.0 - labels01, labels01], axis=-1)   # [N, 2]
    heads = diver_heads(logits, diver_num)                    # [N, D, 2]
    losses = [weighted_softmax_cross_entropy(heads[:, k], onehot,
                                             node_weights)
              for k in range(diver_num)]
    return jnp.min(jnp.stack(losses))


def hindsight_diver_accuracy(logits, labels01, diver_num: int):
    """Max-over-heads accuracy (gcn/models.py:344-349): evaluate every
    diver head's argmax accuracy against the labels; report the best."""
    onehot = jnp.stack([1.0 - labels01, labels01], axis=-1)
    heads = diver_heads(logits, diver_num)
    accs = [accuracy(heads[:, k], onehot) for k in range(diver_num)]
    return jnp.max(jnp.stack(accs))


def hindsight_diver_f1(logits, labels01, diver_num: int):
    """Max-over-heads F1/precision/recall (gcn/models.py:351-361): each
    metric maxed over heads INDEPENDENTLY, exactly as the reference's
    per-metric reduce_max chain does (the reported triple need not come
    from a single head). Returns (f1, precision, recall)."""
    onehot = jnp.stack([1.0 - labels01, labels01], axis=-1)
    heads = diver_heads(logits, diver_num)
    f1s, precs, recs = [], [], []
    for k in range(diver_num):
        f1, p, r = f1_precision_recall(heads[:, k], onehot)
        f1s.append(f1)
        precs.append(p)
        recs.append(r)
    return (jnp.max(jnp.stack(f1s)), jnp.max(jnp.stack(precs)),
            jnp.max(jnp.stack(recs)))


def gcn_dqn_loss(outputs, labels, diver_num: int):
    """GCN_DQN regression loss (gcn/models.py:462-479): RMSE on the first
    head + min with mean-L1 of each shifted extra head."""
    out_dim = labels.shape[-1]
    loss = jnp.sqrt(jnp.mean((outputs[:, :out_dim] - labels) ** 2))
    for i in range(1, diver_num):
        l1 = jnp.mean(jnp.abs(outputs[:, i: i + out_dim] - labels))
        loss = jnp.minimum(loss, l1)
    return loss


def gcn2_dqn_loss(outputs, labels):
    """GCN2_DQN RMSE (gcn/models.py:613-626)."""
    return jnp.sqrt(jnp.mean((outputs[:, : labels.shape[-1]] - labels) ** 2))
