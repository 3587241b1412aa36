"""Linear probing on cached embeddings (phase 2 of train_freeze).

Reference: ``LinearClassifierPLModule`` (``methods/atst/downstream/
model.py:44-127``) — LinearHead(BN-no-affine + Linear), SGD momentum
0.9 no-WD with CosineAnnealingLR over epochs, CE or BCE-with-logits by
task multi_label, metric ACC or mAP, best epoch selected on the val
metric. Here the whole per-epoch optimization runs as one jitted
``lax.scan`` over minibatches on device; embeddings stay resident in
HBM (they are tiny: N x n_blocks*2*D).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiossl_tpu.downstream.metrics import Metric
from audiossl_tpu.models.heads import LinearHead


@dataclasses.dataclass
class LinearProbeConfig:
    learning_rate: float = 2e-3      # reference eval_env.sh default
    batch_size: int = 1024
    max_epochs: int = 100            # reference train_freeze.py default
    momentum: float = 0.9
    multi_label: bool = False
    num_labels: int = 0
    lr_scale: float = 1.0            # lr * world_bs / 256 rule applied by caller
    mixup_training: bool = False
    seed: int = 0


def _loss(logits, labels, multi_label: bool):
    if multi_label:
        return optax.sigmoid_binary_cross_entropy(
            logits, labels).sum(-1).mean()
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels).mean()


def train_linear_probe(train_emb: np.ndarray, train_y: np.ndarray,
                       val_emb: np.ndarray, val_y: np.ndarray,
                       test_emb: np.ndarray, test_y: np.ndarray,
                       cfg: LinearProbeConfig, keeper=None) -> dict:
    """Full probe: train with per-epoch cosine LR, select the best epoch
    by val metric, report test metric at that epoch's params.

    ``keeper``: optional ``training.checkpoint.TopKKeeper`` persisting
    the top-k epoch heads (reference ModelCheckpoint save_top_k=10 on
    val metric, train_freeze.py:117-124)."""
    num_labels = cfg.num_labels or (
        train_y.shape[1] if train_y.ndim == 2 else int(train_y.max()) + 1)
    head = LinearHead(num_labels=num_labels)
    rng = jax.random.PRNGKey(cfg.seed)
    variables = head.init(rng, jnp.zeros((2, train_emb.shape[1])),
                          train=True)
    params, stats = variables["params"], variables.get("batch_stats", {})

    lr = cfg.learning_rate * cfg.lr_scale
    n = len(train_emb)
    bs = min(cfg.batch_size, n)
    steps_per_epoch = max(n // bs, 1)
    sched = optax.cosine_decay_schedule(lr, cfg.max_epochs * steps_per_epoch)
    tx = optax.chain(optax.trace(decay=cfg.momentum, nesterov=False),
                     optax.scale_by_learning_rate(sched))
    opt_state = tx.init(params)

    x_all = jnp.asarray(train_emb)
    y_all = jnp.asarray(train_y)
    multi = cfg.multi_label

    @jax.jit
    def epoch_fn(params, stats, opt_state, perm):
        def body(carry, idx):
            params, stats, opt_state = carry
            xb = jnp.take(x_all, idx, axis=0)
            yb = jnp.take(y_all, idx, axis=0)

            def loss_fn(p):
                logits, upd = head.apply(
                    {"params": p, "batch_stats": stats}, xb, train=True,
                    mutable=["batch_stats"])
                return _loss(logits, yb, multi), upd["batch_stats"]

            (l, new_stats), g = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_stats, opt_state), l

        idxs = perm[: steps_per_epoch * bs].reshape(steps_per_epoch, bs)
        (params, stats, opt_state), losses = jax.lax.scan(
            body, (params, stats, opt_state), idxs)
        return params, stats, opt_state, losses.mean()

    @jax.jit
    def predict(params, stats, x):
        logits = head.apply({"params": params, "batch_stats": stats}, x,
                            train=False)
        return logits

    def evaluate(params, stats, emb, y):
        m = Metric("mAP" if multi else "ACC")
        logits = np.asarray(predict(params, stats, jnp.asarray(emb)))
        if multi:
            m.update(1.0 / (1.0 + np.exp(-logits)), y)
        else:
            m.update(logits, y)
        return m.compute()

    best_val, best = -1.0, None
    key = rng
    losses = []
    for epoch in range(cfg.max_epochs):
        key, sk = jax.random.split(key)
        perm = jax.random.permutation(sk, n)
        params, stats, opt_state, l = epoch_fn(params, stats, opt_state,
                                               perm)
        losses.append(float(l))
        if len(val_emb):
            v = evaluate(params, stats, val_emb, val_y)
        else:
            v = -float(l)
        if v > best_val:
            best_val = v
            best = (jax.tree.map(lambda a: a, params),
                    jax.tree.map(lambda a: a, stats))
        if keeper is not None:
            keeper.update(v, epoch, {
                "params": jax.device_get(params),
                "batch_stats": jax.device_get(stats)})

    params, stats = best
    test_metric = evaluate(params, stats, test_emb, test_y) \
        if len(test_emb) else float("nan")
    return {
        "val_metric": best_val,
        "test_metric": test_metric,
        "train_losses": losses,
        "params": params,
        "batch_stats": stats,
    }
