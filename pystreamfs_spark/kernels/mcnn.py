"""Micro-Cluster Nearest Neighbor feature selection (Hammoodi, Stahl,
Badii — 2018), re-implemented from the paper's mechanics as realized by the
reference harness (/root/reference/pystreamfs/algorithms/mcnn.py:5-473; the
reference itself disclaims exactness vs the paper, mcnn.py:8-9).

Per instance, in stream order:
  1. nearest micro-cluster by L1 centroid distance
  2. if > ``max_out_of_var_bound`` fraction of dims fall outside the
     cluster's variance boundary → create a new cluster seeded at x
  3. else add the instance: error bookkeeping (error count of the target
     cluster and of the nearest cluster sharing the true label), FIFO
     eviction to ``max_n``, error-threshold split seeding children at the
     parent's Q1/Q3 centroids
  4. evict the stalest cluster when its false-positive count > 0
Per window:
  5. per-cluster feature velocity |mean_t − mean_{t−1}|
  6. drift detection on split/death-rate percentage differences (> 50%)
  7. information gain via a NumPy MI estimator (kernels/mi.py — the
     reference calls sklearn's mutual_info_classif(random_state=0))
  8. IG refresh rule: > 50% IG change makes an irrelevant feature relevant
  9. on drift: the max-IQR-scoring feature is declared irrelevant
  w = IG where relevant else 0.

State = (TimeWindowState, {cluster_id: MicroClusterState}) — plain
picklable objects, folded per entity like every other kernel.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np

from pystreamfs_spark.kernels.mi import mutual_info_classif_np


class MicroClusterState:
    def __init__(self, t: int, x: np.ndarray, y: float, max_n: int, e_threshold: int):
        self.f_val = np.array(x)
        self.f_val2 = np.array(x**2)
        self.t = np.array(t, ndmin=1)
        self.n = 1
        self.max_n = max_n
        self.label = y
        self.e = 0
        self.e_threshold = e_threshold
        self.fpr = 0
        self.max_iqr = np.zeros(x.shape)
        self.instances = np.array(x, ndmin=2)
        self.instance_labels = np.array([int(y)])
        self.centroid = self.f_val / self.n
        self.variance = np.ones(x.shape)
        self.velocity = np.zeros(x.shape)
        self.q1 = self.f_val
        self.q3 = self.f_val
        self.iqr = self.q3 - self.q1
        self.f_val_h = np.zeros(x.shape)
        self.n_h = 0

    def refresh_stats(self) -> None:
        while self.n > self.max_n:  # FIFO eviction
            self.instances = np.delete(self.instances, 0, 0)
            self.t = np.delete(self.t, 0, 0)
            self.instance_labels = np.delete(self.instance_labels, 0, 0)
            self.n -= 1
        self.f_val = np.sum(self.instances, axis=0)
        self.n = self.instances.shape[0]
        self.f_val2 = np.sum(self.instances**2, axis=0)
        self.label = np.argmax(np.bincount(self.instance_labels))
        self.variance = np.sqrt((self.f_val2 / self.n) - (self.f_val / self.n) ** 2)
        self.centroid = self.f_val / self.n
        self.q1 = np.percentile(self.instances, 25, axis=0)
        self.q3 = np.percentile(self.instances, 75, axis=0)
        self.iqr = self.q3 - self.q1


@dataclass
class MCNNState:
    m: int
    max_n: int = 50
    e_threshold: int = 3
    max_out_of_var_bound: float = 0.3
    p_diff_threshold: float = 50.0
    window: Any = None
    clusters: dict = field(default_factory=dict)

    @classmethod
    def init(
        cls,
        m: int,
        num_features: int = 5,
        max_n: int = 50,
        e_threshold: int = 3,
        max_out_of_var_bound: float = 0.3,
        p_diff_threshold: float = 50.0,
    ) -> "MCNNState":
        del num_features
        return cls(
            m=m,
            max_n=max_n,
            e_threshold=e_threshold,
            max_out_of_var_bound=max_out_of_var_bound,
            p_diff_threshold=p_diff_threshold,
        )


class _TimeWindow:
    def __init__(self, m: int):
        self.t = 0
        self.n = 0
        self.cluster_idx = 0
        self.drift = False
        self.splits = 0
        self.deaths = 0
        self.split_rate = 0.0
        self.split_rate_h = 0.0
        self.death_rate = 0.0
        self.death_rate_h = 0.0
        self.ftr_relevancy = np.ones(m)
        self.ftr_ig = np.ones(m)
        self.selected_ftr = np.ones(m)


def _add_instance(c, c_key, x, y, window, dist_sums, clusters, e_threshold):
    c.instances = np.append(c.instances, [x], axis=0)
    c.t = np.append(c.t, window.t)
    c.instance_labels = np.append(c.instance_labels, int(y))
    c.n += 1
    if y == c.label:
        if c.e > 0:
            c.e -= 1
    else:
        c.e += 1
        if y == 1:
            c.fpr += 1
        dist_sums.pop(c_key, None)
        for i in sorted(dist_sums, key=dist_sums.get):
            if clusters[i].label == y:
                clusters[i].e += 1
                break
    if c.e > c.e_threshold:
        # split: children seeded at the parent's quartile centroids
        new_c1 = MicroClusterState(window.t, c.q1, c.label, c.max_n, c.e_threshold)
        new_c2 = MicroClusterState(window.t, c.q3, c.label, c.max_n, c.e_threshold)
        window.splits += 1
        clusters[window.cluster_idx] = new_c1
        window.cluster_idx += 1
        clusters[window.cluster_idx] = new_c2
        window.cluster_idx += 1
        clusters.pop(c_key, None)
    else:
        c.refresh_stats()
        clusters[c_key] = c
    return clusters


def _remove_stalest(clusters, window):
    t_diff = {key: window.t - np.sum(c.t) / c.n for key, c in clusters.items()}
    stalest = max(t_diff, key=t_diff.get)
    if clusters[stalest].fpr:
        clusters.pop(stalest, None)
        window.deaths += 1
    return clusters, window


def _percent_diff(cur: float, hist: float) -> float:
    mean = (cur + hist) / 2
    if mean == 0:
        return 0.0
    return (abs(cur - hist) / mean) * 100


def mcnn_update(state: MCNNState, X: np.ndarray, y: np.ndarray) -> tuple[MCNNState, np.ndarray]:
    window = state.window if state.window is not None else _TimeWindow(state.m)
    clusters = state.clusters

    window.t += 1
    window.n = X.shape[0]
    window.split_rate_h = window.split_rate
    window.death_rate_h = window.death_rate
    window.splits = 0
    window.deaths = 0
    window.split_rate = 0.0
    window.death_rate = 0.0

    for xi, yi in zip(X, y):
        if clusters:
            dist_sums = {key: float(np.sum(np.abs(c.centroid - xi))) for key, c in clusters.items()}
            min_key = min(dist_sums, key=dist_sums.get)
            min_c = clusters[min_key]
            min_dist = np.abs(min_c.centroid - xi)
            out_of_boundary = np.sum(min_dist > min_c.variance) / len(min_dist)
            if out_of_boundary > state.max_out_of_var_bound:
                clusters[window.cluster_idx] = MicroClusterState(
                    window.t, xi, yi, state.max_n, state.e_threshold
                )
                window.cluster_idx += 1
            else:
                clusters = _add_instance(
                    min_c, min_key, xi, yi, window, dist_sums, clusters, state.e_threshold
                )
        else:
            clusters[window.cluster_idx] = MicroClusterState(
                window.t, xi, yi, state.max_n, state.e_threshold
            )
            window.cluster_idx += 1
        if len(clusters) > 1:
            clusters, window = _remove_stalest(clusters, window)

    for c in clusters.values():
        c.velocity = np.abs(c.f_val / c.n - (c.f_val_h / c.n_h if c.n_h else np.zeros(state.m)))
        c.f_val_h = c.f_val
        c.n_h = c.n

    # drift detection on split/death-rate percentage differences
    window.split_rate = window.splits / window.n
    window.death_rate = window.deaths / window.n
    mean_split = (window.split_rate + window.split_rate_h) / 2
    mean_death = (window.death_rate + window.death_rate_h) / 2
    p_split = _percent_diff(window.split_rate, window.split_rate_h)
    p_death = _percent_diff(window.death_rate, window.death_rate_h)
    window.drift = (
        window.split_rate > mean_split
        and window.death_rate > mean_death
        and p_split > state.p_diff_threshold
        and p_death > state.p_diff_threshold
    )

    # information-gain refresh (all features at t=1; irrelevant ones later)
    if window.t == 1:
        ftr_idx = np.where(window.ftr_relevancy == 1)[0]
    else:
        ftr_idx = np.where(window.ftr_relevancy == 0)[0]
    if ftr_idx.size:
        data = np.concatenate([c.instances for c in clusters.values()], axis=0)
        labels = np.concatenate([c.instance_labels for c in clusters.values()])
        ig = mutual_info_classif_np(data, labels, random_state=0)
        for ftr in ftr_idx:
            if _percent_diff(window.ftr_ig[ftr], ig[ftr]) > 50:
                window.ftr_relevancy[ftr] = 1
            window.ftr_ig[ftr] = ig[ftr]
        window.selected_ftr[:] = 0
        window.selected_ftr[window.ftr_relevancy == 1] = window.ftr_ig[window.ftr_relevancy == 1]

    if window.drift:
        max_iqr_scores = np.zeros(state.m)
        for c in clusters.values():
            c.max_iqr[np.argmax(c.iqr)] += 1
            max_iqr_scores += c.max_iqr
        window.ftr_relevancy[np.argmax(max_iqr_scores)] = 0
        window.selected_ftr[:] = 0
        window.selected_ftr[window.ftr_relevancy == 1] = window.ftr_ig[window.ftr_relevancy == 1]

    state.window = window
    state.clusters = clusters
    return state, window.selected_ftr.copy()
