"""CancelOut feature selection (Borisov et al.) — NumPy re-expression.

Reference (/root/reference/pystreamfs/algorithms/cancelout.py:8-194) trains,
per window, a fresh 2-layer torch net with a sigmoid gating layer
``x · σ(w_gate)`` (gate init zeros), Linear(m→m+1) + ReLU6 + Linear(m+1→2),
CrossEntropyLoss, Adam(lr=0.01), batch 32 *shuffled*, ≤20 epochs with
patience-3 early stopping on the running average of ALL minibatch losses
(the reference's accumulator spans epochs — quirk preserved). The gate
weights are the feature weights.

torch is absent in the target environment and the reference is
non-deterministic by construction (unseeded DataLoader shuffle + unseeded
init → no allclose target exists, SURVEY.md §2.2 #15). This NumPy version
keeps the architecture, loss, optimizer and early-stop rule but makes every
stochastic path SEEDED: init ~ U(−1/√fan_in, 1/√fan_in) (torch Linear's
default bound) and the per-epoch permutation both come from one
np.random.default_rng(seed), so outputs are reproducible run-to-run.
Stateless across windows (the net is rebuilt each window, as in the
reference).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def _relu6(z: np.ndarray) -> np.ndarray:
    return np.clip(z, 0.0, 6.0)


class _Adam:
    def __init__(self, shapes, lr=0.01, b1=0.9, b2=0.999, eps=1e-8):
        self.lr, self.b1, self.b2, self.eps = lr, b1, b2, eps
        self.m = [np.zeros(s) for s in shapes]
        self.v = [np.zeros(s) for s in shapes]
        self.t = 0

    def step(self, params, grads):
        self.t += 1
        out = []
        for i, (p, g) in enumerate(zip(params, grads)):
            self.m[i] = self.b1 * self.m[i] + (1 - self.b1) * g
            self.v[i] = self.b2 * self.v[i] + (1 - self.b2) * g * g
            mhat = self.m[i] / (1 - self.b1**self.t)
            vhat = self.v[i] / (1 - self.b2**self.t)
            out.append(p - self.lr * mhat / (np.sqrt(vhat) + self.eps))
        return out


def train_cancelout(
    X: np.ndarray,
    y: np.ndarray,
    num_epochs: int = 20,
    batch_size: int = 32,
    lr: float = 0.01,
    patience: int = 3,
    seed: int = 0,
) -> np.ndarray:
    """Train one fresh gated net on (X, y); return the gate weights."""
    rng = np.random.default_rng(seed)
    n, m = X.shape
    h = m + 1
    bound1 = 1.0 / np.sqrt(m)
    bound2 = 1.0 / np.sqrt(h)
    g = np.zeros(m)  # CancelOut gate (reference inits zeros)
    W1 = rng.uniform(-bound1, bound1, (h, m))
    b1 = rng.uniform(-bound1, bound1, h)
    W2 = rng.uniform(-bound2, bound2, (2, h))
    b2 = rng.uniform(-bound2, bound2, 2)
    opt = _Adam([g.shape, W1.shape, b1.shape, W2.shape, b2.shape], lr=lr)

    yi = y.astype(int)
    train_losses: list[float] = []
    best_score = None
    counter = 0
    for _epoch in range(num_epochs):
        order = rng.permutation(n)
        for s in range(0, n, batch_size):
            idx = order[s : s + batch_size]
            xb, yb = X[idx], yi[idx]
            bs = len(idx)
            sig = 1.0 / (1.0 + np.exp(-g))
            x1 = xb * sig
            z1 = x1 @ W1.T + b1
            a1 = _relu6(z1)
            z2 = a1 @ W2.T + b2
            # cross entropy (softmax)
            zmax = z2.max(axis=1, keepdims=True)
            ez = np.exp(z2 - zmax)
            probs = ez / ez.sum(axis=1, keepdims=True)
            loss = -np.mean(np.log(probs[np.arange(bs), yb] + 1e-12))
            train_losses.append(float(loss))
            # backward
            dz2 = probs.copy()
            dz2[np.arange(bs), yb] -= 1.0
            dz2 /= bs
            dW2 = dz2.T @ a1
            db2 = dz2.sum(axis=0)
            da1 = dz2 @ W2
            dz1 = da1 * ((z1 > 0) & (z1 < 6))
            dW1 = dz1.T @ x1
            db1 = dz1.sum(axis=0)
            dx1 = dz1 @ W1
            dg = np.sum(dx1 * xb * sig * (1 - sig), axis=0)
            g, W1, b1, W2, b2 = opt.step([g, W1, b1, W2, b2], [dg, dW1, db1, dW2, db2])
        # early stopping on the cumulative-average loss (reference quirk)
        score = -float(np.average(train_losses))
        if best_score is None:
            best_score = score
        elif score < best_score:
            counter += 1
            if counter >= patience:
                break
        else:
            best_score = score
            counter = 0
    return g


@dataclass
class CancelOutState:
    num_epochs: int = 20
    seed: int = 0

    @classmethod
    def init(cls, m: int, num_features: int = 5, num_epochs: int = 20, seed: int = 0) -> "CancelOutState":
        del m, num_features
        return cls(num_epochs=num_epochs, seed=seed)


def cancelout_update(state: CancelOutState, X: np.ndarray, y: np.ndarray) -> tuple[CancelOutState, np.ndarray]:
    w = train_cancelout(X, y, num_epochs=state.num_epochs, seed=state.seed)
    return state, w
