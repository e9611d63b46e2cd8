"""Feature Selection on Data Streams (Huang, Yoo, Kasiviswanathan — CIKM 2015)
via Frequent Directions matrix sketching (Liberty 2013).

Semantics matched to the reference harness kernel
(/root/reference/pystreamfs/algorithms/fsds.py:5-74) for allclose parity:

per window (batch of n rows × m features):
  1. work on the transpose Yt (features as rows)
  2. sketch size ℓ defaults to ⌈√m⌉ (int(√m)) when unset
  3. first window seeds the sketch: B := Yt[:, :ℓ]; C := Yt
     subsequent windows: C := [B | Yt]  (m × (ℓ+n))
  4. thin SVD of C; retain top-ℓ singular triplets
  5. Frequent-Directions shrink: s ← √(s² − s_ℓ²)  (NaNs → 0, a deliberate
     small-batch guard the reference added, fsds.py:50-52)
  6. B ← U·diag(s)
  7. ridge regularizer α = 2³·s_k (paper §5.1 pre-experiment setting)
  8. D = diag(s_k / (s_k² + α)) over the top-k values (NaNs → 0 guard)
  9. feature weights w = rowmax |U[:, :k] · D|

w is sign-invariant by construction (|·| of U columns), so SVD sign ambiguity
does not affect selections; parity tests compare w directly (same BLAS).
State carried across windows: the m×ℓ sketch B (and resolved ℓ).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class FSDSState:
    """Cross-window state: the Frequent-Directions sketch."""

    B: np.ndarray | None  # float64[m, ell] or None before first window
    ell: int
    k: int
    m: int

    @classmethod
    def init(cls, m: int, k: int = 2, ell: int = 0, num_features: int = 5) -> "FSDSState":
        del num_features  # selection count applies downstream, not in-kernel
        resolved_ell = ell if ell >= 1 else int(np.sqrt(m))
        if resolved_ell < k:
            # the reference crashes with an opaque IndexError here
            # (fsds.py:60 s[k-1] after truncation to ell values); make the
            # configuration contract explicit instead
            raise ValueError(
                f"FSDS needs sketch size ell >= k: got ell={resolved_ell} "
                f"(from m={m}) and k={k}; pass a larger ell or smaller k"
            )
        return cls(B=None, ell=ell, k=k, m=m)


def fsds_update(state: FSDSState, X: np.ndarray, y: np.ndarray | None = None) -> tuple[FSDSState, np.ndarray]:
    """Fold one window through the FSDS sketch update; returns (state, w)."""
    del y  # unsupervised
    Yt = X.T.astype(np.float64, copy=False)
    ell = state.ell if state.ell >= 1 else int(np.sqrt(state.m))
    k = state.k

    if state.B is None or state.B.size == 0:
        # seeding window: B is the first ell columns, C is all of Yt
        C = np.hstack((Yt[:, :ell], Yt[:, ell:]))
    else:
        C = np.hstack((state.B, Yt))

    U, s, _ = np.linalg.svd(C, full_matrices=False)
    U = U[:, :ell]
    s = s[:ell]

    delta = s[-1] ** 2
    with np.errstate(invalid="ignore"):
        s = np.sqrt(s**2 - delta)
    s = np.nan_to_num(s)

    B = np.dot(U, np.diag(s))

    alpha = (2**3) * s[k - 1]
    with np.errstate(divide="ignore", invalid="ignore"):
        D = np.diag(s[:k] / (s[:k] ** 2 + alpha))
    D = np.nan_to_num(D)

    w = np.amax(np.abs(np.dot(U[:, :k], D)), axis=1)
    return FSDSState(B=B, ell=ell, k=k, m=state.m), w
