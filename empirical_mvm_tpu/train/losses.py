"""Loss functions shared across tasks.

Parity targets: ``T.nn.CrossEntropyLoss(ignore_index=-1)`` (ref: agent.py:57),
``NormSoftmaxLoss`` bidirectional InfoNCE (ref: agent.py:34-50), masked-L1
MVM losses (ref: main_pretrain.py:416-545), and the label-smoothed captioning
KL (ref: model_for_captioning.py:8-33).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cross_entropy_ignore(logits: jax.Array, labels: jax.Array,
                         ignore_index: int = -1) -> jax.Array:
    """Mean CE over positions whose label != ignore_index
    (ref: agent.py:57). logits (..., V), labels (...) int."""
    v = logits.shape[-1]
    logits = logits.reshape(-1, v).astype(jnp.float32)
    labels = labels.reshape(-1)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    ls = optax.softmax_cross_entropy_with_integer_labels(logits, safe)
    denom = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, ls, 0.0).sum() / denom


def norm_softmax_loss(scores: jax.Array, temperature: float = 0.05) -> jax.Array:
    """Bidirectional InfoNCE on a (B, B) score matrix with matched pairs on
    the diagonal (ref: agent.py:34-50)."""
    s = scores.astype(jnp.float32) / temperature
    i_logsm = jax.nn.log_softmax(s, axis=1)
    j_logsm = jax.nn.log_softmax(s.T, axis=1)
    loss_i = jnp.diagonal(i_logsm).mean()
    loss_j = jnp.diagonal(j_logsm).mean()
    return -loss_i - loss_j


def masked_l1(pred: jax.Array, target: jax.Array, mask: jax.Array,
              channel_div: float = 1.0) -> jax.Array:
    """sum(|pred-target| * mask) / (sum(mask)+eps) / channel_div
    (ref: main_pretrain.py:429-430 and siblings)."""
    err = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    m = mask.astype(jnp.float32)
    return (err * m).sum() / (m.sum() + 1e-5) / channel_div


def label_smoothed_nll(logits: jax.Array, labels: jax.Array,
                       epsilon: float = 0.1,
                       ignore_index: int = -1) -> jax.Array:
    """Label-smoothed NLL for captioning (ref: model_for_captioning.py:8-33)."""
    v = logits.shape[-1]
    logits = logits.reshape(-1, v).astype(jnp.float32)
    labels = labels.reshape(-1)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    smooth = -logp.mean(axis=-1)
    ls = (1.0 - epsilon) * nll + epsilon * smooth
    denom = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, ls, 0.0).sum() / denom


def masked_accuracy(pred_ids: jax.Array, labels: jax.Array,
                    ignore_index: int = -1) -> jax.Array:
    """(pred==ans).sum()/(ans!=-1).sum() with -1-safe denom
    (ref: main_pretrain.py:577-578)."""
    valid = labels != ignore_index
    correct = jnp.logical_and(pred_ids == labels, valid)
    return correct.sum() / jnp.maximum(valid.sum(), 1)
