"""Fisher-weighted 1-D k-means for NUQ codebook fitting.

The reference fits sklearn ``KMeans(n_clusters=2**bits, random_state=0,
n_init="auto", max_iter=50)`` with Fisher information as sample weights on the
flattened, range-normalized, outlier-free activation distribution
(quant/kvquant/simquant_module_quantizer.py:508-530).

This is a from-scratch JAX implementation specialized to 1-D data (KVQuant
always clusters scalars): weighted k-means++ seeding followed by Lloyd
iterations where the assignment step is a sorted-centroid midpoint search
(O(N log K) instead of O(N*K)) and the update step is a weighted bincount.
Runs jitted on TPU — calibration of a 7B layer (~134M points) is a few ms per
iteration instead of sklearn's CPU minutes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _assign(x, centers_sorted):
    mids = (centers_sorted[1:] + centers_sorted[:-1]) * 0.5
    return jnp.searchsorted(mids, x, side="left").astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "iters"))
def weighted_kmeans_1d(
    x: jax.Array,
    weights: jax.Array | None = None,
    *,
    k: int,
    iters: int = 50,
    seed: int = 0,
):
    """Cluster 1-D points ``x`` (shape (N,)) with non-negative sample
    ``weights`` into ``k`` centroids. Returns (centroids_sorted, inertia).

    Points with zero weight (used to mask outliers/sink tokens without a
    dynamic-shape compaction) have no influence on seeding or updates.
    """
    x = x.reshape(-1).astype(jnp.float32)
    n = x.shape[0]
    w = (
        jnp.ones((n,), jnp.float32)
        if weights is None
        else weights.reshape(-1).astype(jnp.float32)
    )

    key = jax.random.PRNGKey(seed)

    # --- weighted k-means++ seeding ---
    def seed_step(carry, key_i):
        centers, d2 = carry
        p = w * d2
        idx = jax.random.categorical(key_i, jnp.log(p + 1e-30))
        c_new = x[idx]
        d2 = jnp.minimum(d2, (x - c_new) ** 2)
        centers = jnp.concatenate([centers[1:], c_new[None]])
        return (centers, d2), None

    key, k0 = jax.random.split(key)
    first = x[jax.random.categorical(k0, jnp.log(w + 1e-30))]
    centers0 = jnp.full((k,), first, jnp.float32)
    d2_0 = (x - first) ** 2
    keys = jax.random.split(key, k - 1)
    (centers, _), _ = jax.lax.scan(seed_step, (centers0, d2_0), keys)
    # scan rolled the buffer: first seeded center is now last; order is
    # irrelevant because we sort before Lloyd anyway.
    centers = jnp.sort(centers)

    # --- Lloyd iterations ---
    def lloyd(carry, _):
        centers, _ = carry
        a = _assign(x, centers)
        wsum = jnp.zeros((k,), jnp.float32).at[a].add(w)
        xsum = jnp.zeros((k,), jnp.float32).at[a].add(w * x)
        new = jnp.where(wsum > 0, xsum / jnp.maximum(wsum, 1e-30), centers)
        new = jnp.sort(new)
        inertia = jnp.sum(w * (x - jnp.take(new, _assign(x, new))) ** 2)
        return (new, inertia), None

    (centers, inertia), _ = jax.lax.scan(
        lloyd, (centers, jnp.float32(0.0)), None, length=iters
    )
    return centers, inertia
