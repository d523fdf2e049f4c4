"""K-means inducing point initialisation.

reference: code/dsp/utils.py:143-159 (`KMEANS`): sklearn k-means++ with
n_init restarts and a fixed seed so the starting point is reproducible.
"""

from __future__ import annotations

import numpy as np

from .. import config as cfg


def kmeans_centers(X, num_Z: int, n_init: int = 1, seed: int | None = None):
    from sklearn.cluster import KMeans

    if seed is None:
        seed = cfg.config_seed
    X = np.asarray(X, dtype=np.float64)
    km = KMeans(n_clusters=num_Z, init="k-means++", n_init=n_init,
                random_state=seed).fit(X)
    return km.cluster_centers_
