"""Downstream MLP classifier in JAX.

Replaces the reference's Keras MLP (reference classifier/train.py:230-391):
Dense 512 → 128 → num_classes with L2 1e-5, Adam, early stopping with
patience on val_loss, best-checkpoint restore before evaluation. The
whole training set lives on device; each epoch is a scan over shuffled
minibatches, so small downstream datasets train in seconds on one chip.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

LOGGER = logging.getLogger("l3embedding_tpu.classifier")


def init_mlp_params(rng, input_dim, num_classes=10, hidden=(512, 128)):
    dims = [input_dim, *hidden, num_classes]
    params = []
    keys = jax.random.split(rng, len(dims) - 1)
    for k, (d_in, d_out) in zip(keys, zip(dims[:-1], dims[1:])):
        w = jax.random.normal(k, (d_in, d_out)) * np.sqrt(2.0 / d_in)
        params.append({"w": w.astype(jnp.float32), "b": jnp.zeros(d_out)})
    return params


def mlp_logits(params, x):
    for layer in params[:-1]:
        x = jax.nn.relu(x @ layer["w"] + layer["b"])
    last = params[-1]
    return x @ last["w"] + last["b"]


def _loss_fn(params, x, y_onehot, weight_decay):
    logits = mlp_logits(params, x)
    ce = optax.softmax_cross_entropy(logits, y_onehot).mean()
    l2 = sum(jnp.sum(jnp.square(layer["w"])) for layer in params)
    return ce + weight_decay * l2, logits


def train_mlp_jax(
    X_train,
    y_train,
    X_valid=None,
    y_valid=None,
    num_classes=10,
    batch_size=64,
    num_epochs=100,
    valid_split=0.15,
    patience=20,
    learning_rate=1e-4,
    weight_decay=1e-5,
    random_state=12345678,
    verbose=False,
):
    """Train; returns (best_params, history dict).

    history keys: train_loss, valid_loss, train_acc, valid_acc (one entry
    per epoch up to early stop), best_epoch.
    """
    rng = np.random.RandomState(random_state)
    if X_valid is None:
        n = len(X_train)
        idx = rng.permutation(n)
        n_valid = int(n * valid_split)
        X_valid, y_valid = X_train[idx[:n_valid]], y_train[idx[:n_valid]]
        X_train, y_train = X_train[idx[n_valid:]], y_train[idx[n_valid:]]

    def onehot(y):
        return np.eye(num_classes, dtype=np.float32)[np.asarray(y, dtype=int)]

    Xt = jnp.asarray(X_train, jnp.float32)
    Yt = jnp.asarray(onehot(y_train))
    Xv = jnp.asarray(X_valid, jnp.float32)
    Yv = jnp.asarray(onehot(y_valid))

    params = init_mlp_params(
        jax.random.PRNGKey(random_state), X_train.shape[1], num_classes
    )
    tx = optax.adam(learning_rate, eps=1e-8)
    opt_state = tx.init(params)

    @jax.jit
    def train_epoch(params, opt_state, perm):
        def body(carry, idx):
            params, opt_state = carry
            xb = jnp.take(Xt, idx, axis=0)
            yb = jnp.take(Yt, idx, axis=0)
            (loss, logits), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
                params, xb, yb, weight_decay
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            acc = jnp.mean(
                (jnp.argmax(logits, -1) == jnp.argmax(yb, -1)).astype(jnp.float32)
            )
            return (params, opt_state), (loss, acc)

        (params, opt_state), (losses, accs) = jax.lax.scan(
            body, (params, opt_state), perm
        )
        return params, opt_state, losses.mean(), accs.mean()

    @jax.jit
    def evaluate(params, X, Y):
        loss, logits = _loss_fn(params, X, Y, weight_decay)
        acc = jnp.mean(
            (jnp.argmax(logits, -1) == jnp.argmax(Y, -1)).astype(jnp.float32)
        )
        return loss, acc

    n_batches = max(1, len(X_train) // batch_size)
    history = {"train_loss": [], "valid_loss": [], "train_acc": [], "valid_acc": []}
    best_val = np.inf
    best_params = params
    best_epoch = 0
    since_best = 0

    for epoch in range(num_epochs):
        perm = rng.permutation(n_batches * batch_size) % len(X_train)
        perm = jnp.asarray(perm.reshape(n_batches, batch_size))
        params, opt_state, tr_loss, tr_acc = train_epoch(params, opt_state, perm)
        va_loss, va_acc = evaluate(params, Xv, Yv)
        history["train_loss"].append(float(tr_loss))
        history["train_acc"].append(float(tr_acc))
        history["valid_loss"].append(float(va_loss))
        history["valid_acc"].append(float(va_acc))
        if verbose:
            LOGGER.info(
                "Epoch %d: loss=%.4f acc=%.4f val_loss=%.4f val_acc=%.4f",
                epoch, tr_loss, tr_acc, va_loss, va_acc,
            )
        if float(va_loss) < best_val:
            best_val = float(va_loss)
            best_params = jax.tree.map(lambda x: x.copy(), params)
            best_epoch = epoch
            since_best = 0
        else:
            since_best += 1
            if since_best > patience:
                break

    history["best_epoch"] = best_epoch
    return best_params, history


def predict_proba(params, X, batch_size=4096):
    fn = jax.jit(lambda p, x: jax.nn.softmax(mlp_logits(p, x)))
    out = []
    for i in range(0, len(X), batch_size):
        out.append(np.asarray(fn(params, jnp.asarray(X[i : i + batch_size]))))
    return np.concatenate(out)
