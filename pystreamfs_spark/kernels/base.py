"""Unified kernel protocol used by the fold operator.

The reference's extension contract is ``fs_algorithm(X, Y, w, param) ->
(w, param)`` dispatched once per window (/root/reference/pystreamfs/
pystreamfs.py:68). Here each kernel is a pair (``init_state``, ``update``)
keyed by name, plus the harness's top-m selection rule
(/root/reference/pystreamfs/pystreamfs.py:70):

    selected = argsort(|w|) reversed, first ``num_features`` indices

i.e. a *reversed stable-quicksort* order — ties resolve exactly as NumPy's
default argsort does after ``[::-1]``; we call the identical expression so
selections match the oracle index-for-index.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

from pystreamfs_spark.kernels.cancelout import CancelOutState, cancelout_update
from pystreamfs_spark.kernels.efs import EFSState, efs_update
from pystreamfs_spark.kernels.fsds import FSDSState, fsds_update
from pystreamfs_spark.kernels.mcnn import MCNNState, mcnn_update
from pystreamfs_spark.kernels.ofs import OFSState, ofs_update

# name -> (init_state(m, **kw) -> state, update(state, X, y) -> (state, w))
KERNELS: dict[str, tuple[Callable[..., Any], Callable[..., tuple[Any, np.ndarray]]]] = {
    "ofs": (OFSState.init, ofs_update),
    "fsds": (FSDSState.init, fsds_update),
    "efs": (EFSState.init, efs_update),
    "mcnn": (MCNNState.init, mcnn_update),
    "cancelout": (CancelOutState.init, cancelout_update),
}


def init_state(kernel: str, m: int, **kw: Any) -> Any:
    try:
        init, _ = KERNELS[kernel]
    except KeyError:
        raise ValueError(f"unknown kernel {kernel!r}; available: {sorted(KERNELS)}") from None
    return init(m, **kw)


def update(kernel: str, state: Any, X: np.ndarray, y: np.ndarray) -> tuple[Any, np.ndarray]:
    _, upd = KERNELS[kernel]
    return upd(state, X, y)


def select_top_m(w: np.ndarray, num_features: int) -> np.ndarray:
    """Top-m feature indices by |w|, reference tie-break order preserved."""
    return np.argsort(np.abs(w))[::-1][:num_features]
