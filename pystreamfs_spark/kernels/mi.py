"""Mutual information between continuous features and a discrete target —
pure NumPy reimplementation of the Ross (2014) nearest-neighbor estimator,
mirroring the structure sklearn's ``mutual_info_classif`` uses (the reference
kernel calls it with ``random_state=0``, /root/reference/pystreamfs/
algorithms/mcnn.py:179). sklearn is absent in the target environment, so
this is a documented re-derivation, not a bit-parity clone:

1. deterministic noise injection (RandomState(seed)) to break ties, scaled
   like sklearn's (1e-10 · max(1, mean|x|) · N(0,1))
2. per class: distance to the k-th same-class neighbor (k=3 capped at
   count−1) in the 1-D feature
3. m_i = #points (any class) strictly inside that radius
4. MI = ψ(N) + mean ψ(k) − mean ψ(N_class) − mean ψ(m_i), clipped at 0

ψ (digamma) is evaluated with the standard recurrence + asymptotic series
(|err| < 1e-12 — far below estimator noise).
"""

from __future__ import annotations

import numpy as np


def digamma(x: np.ndarray) -> np.ndarray:
    """Vectorized digamma via recurrence to x ≥ 6 + asymptotic expansion."""
    x = np.asarray(x, dtype=np.float64).copy()
    out = np.zeros_like(x)
    # recurrence: psi(x) = psi(x+1) - 1/x  until x >= 10
    for _ in range(12):
        small = x < 10
        if not small.any():
            break
        out[small] -= 1.0 / x[small]
        x[small] += 1.0
    inv2 = 1.0 / (x * x)
    out += (
        np.log(x)
        - 0.5 / x
        - inv2 * (1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 * (1.0 / 252.0 - inv2 / 240.0)))
    )
    return out


def _mi_cd_1d(c: np.ndarray, d: np.ndarray, n_neighbors: int = 3) -> float:
    """MI between one continuous 1-D variable and a discrete target."""
    n = len(c)
    radius = np.zeros(n)
    label_counts = np.zeros(n)
    k_all = np.zeros(n)
    for label in np.unique(d):
        mask = d == label
        count = int(mask.sum())
        if count > 1:
            k = min(n_neighbors, count - 1)
            vals = np.sort(c[mask])
            # distance to k-th nearest same-class neighbor, per point.
            # Vectorized (r06): in sorted 1-D values the k nearest lie among
            # the k predecessors and k successors of the point's position, so
            # the greedy two-pointer walk's k-th pick equals the k-th order
            # statistic of those 2k candidate distances — same subtractions,
            # same value, no per-point Python loop. Position p is the FIRST
            # occurrence of v (searchsorted left), and exactly that one
            # occurrence is skipped; equal-valued OTHER points sit at p+1..
            # and remain valid 0-distance neighbors, as in the loop form
            # (pinned equal in tests against the loop reference).
            pos = np.searchsorted(vals, c[mask])
            vp = np.concatenate(
                [np.full(k, -np.inf), vals, np.full(k, np.inf)]
            )
            j = np.arange(k)
            cm = c[mask][:, None]
            left = cm - vp[k + pos[:, None] - 1 - j]  # out of range → +inf
            right = vp[k + pos[:, None] + 1 + j] - cm
            cands = np.concatenate([left, right], axis=1)
            r = np.partition(cands, k - 1, axis=1)[:, k - 1]
            radius[mask] = np.nextafter(r, 0)
            k_all[mask] = k
        label_counts[mask] = count

    keep = label_counts > 1
    n_eff = int(keep.sum())
    if n_eff == 0:
        return 0.0
    cs = np.sort(c[keep])
    lo = np.searchsorted(cs, c[keep] - radius[keep], side="left")
    hi = np.searchsorted(cs, c[keep] + radius[keep], side="right")
    m_all = hi - lo  # count within the (closed) radius, incl. the point
    mi = (
        digamma(np.array([n_eff]))[0]
        + np.mean(digamma(k_all[keep]))
        - np.mean(digamma(label_counts[keep]))
        - np.mean(digamma(m_all.astype(np.float64)))
    )
    return max(0.0, float(mi))


def mutual_info_classif_np(
    X: np.ndarray, y: np.ndarray, n_neighbors: int = 3, random_state: int = 0
) -> np.ndarray:
    """MI of each feature column against the discrete target."""
    X = np.asarray(X, dtype=np.float64).copy()
    y = np.asarray(y)
    rng = np.random.RandomState(random_state)
    means = np.maximum(1.0, np.mean(np.abs(X), axis=0))
    X += 1e-10 * means * rng.standard_normal(X.shape)
    return np.array([_mi_cd_1d(X[:, j], y, n_neighbors) for j in range(X.shape[1])])
