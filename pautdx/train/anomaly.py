"""Autoencoder anomaly workflow: train on healthy signals, threshold on
reconstruction error.

Equivalent of the reference's Keras AE path (`signals/train_AE.py:20-38`,
`predict_ae.py:6-39`): train the dense AE on healthy A-scans with MSE,
then flag the top-q fraction of reconstruction errors as anomalies
(reference uses the top 10%).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pautdx.models.signal import DenseAutoencoder


def train_autoencoder(healthy_signals: np.ndarray, *, epochs: int = 30,
                      batch_size: int = 64, learning_rate: float = 1e-3,
                      seed: int = 0) -> Tuple[DenseAutoencoder, Dict]:
    """healthy_signals (N, S) -> (model, variables). MSE objective."""
    model = DenseAutoencoder()
    x0 = jnp.asarray(healthy_signals[:1])
    variables = model.init({"params": jax.random.PRNGKey(seed)}, x0)
    params = variables["params"]
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            recon = model.apply({"params": p}, batch)
            return jnp.mean(jnp.square(recon - batch))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    n = healthy_signals.shape[0]
    # small datasets: shrink the batch instead of silently running ZERO
    # steps (n < batch_size made every epoch a no-op and returned a
    # randomly-initialized AE)
    batch_size = min(batch_size, n)
    for _ in range(epochs):
        order = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            batch = jnp.asarray(healthy_signals[order[i:i + batch_size]])
            params, opt_state, loss = step(params, opt_state, batch)
    return model, {"params": params}


def anomaly_threshold(model, variables, healthy_signals: np.ndarray,
                      quantile: float = 0.9) -> float:
    """Error threshold: the ``quantile`` of healthy reconstruction errors
    (reference: top 10% -> quantile 0.9)."""
    recon = model.apply(variables, jnp.asarray(healthy_signals))
    err = np.asarray(DenseAutoencoder.anomaly_score(
        recon, jnp.asarray(healthy_signals)))
    return float(np.quantile(err, quantile))


def detect_anomalies(model, variables, signals: np.ndarray,
                     threshold: float) -> Dict[str, np.ndarray]:
    recon = model.apply(variables, jnp.asarray(signals))
    err = np.asarray(DenseAutoencoder.anomaly_score(
        recon, jnp.asarray(signals)))
    return {"score": err, "is_anomaly": err > threshold}
