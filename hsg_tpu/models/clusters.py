"""Stand-alone clustering modules (SphericalKMeans / SpectralClustering).

Capability parity with reference `hsg/models/embeddings/clusters.py`
(dormant — never imported by the shipped scripts, but public API):
- `SphericalKMeans`: per-image vMF k-means over `[B, N, C]` point sets;
- `SpectralClustering`: exp-kernel graph Laplacian eigenvectors -> k-means.
Re-designed dense/batched: the reference's per-batch-index Python loop is
a `vmap`, and `symeig` is `jnp.linalg.eigh`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hsg_tpu.ops import common, kmeans as kmeans_ops


class SphericalKMeans:
    """vMF k-means over batched point sets.

    call(x `[B, N, C]`, valid `[B, N]` or None) -> labels `[B, N]`.
    """

    def __init__(self, num_clusters: int, iterations: int = 10,
                 concentration: float | None = None):
        self.num_clusters = num_clusters
        self.iterations = iterations
        self.concentration = concentration

    def __call__(self, x, valid=None):
        b, n, c = x.shape
        x = common.normalize_embedding(x)
        init = (jnp.arange(n) * self.num_clusters // n).astype(jnp.int32)
        init = jnp.broadcast_to(init[None], (b, n))
        if valid is None:
            return jax.vmap(lambda e, l: kmeans_ops.kmeans_with_initial_labels(
                e, l, self.num_clusters, self.iterations))(x, init)
        return jax.vmap(lambda e, l, v: kmeans_ops.kmeans_with_initial_labels(
            e, l, self.num_clusters, self.iterations, v))(x, init, valid)


class SpectralClustering:
    """Normalized spectral clustering with an exp inner-product kernel.

    call(x `[B, N, C]`) -> labels `[B, N]`: A = exp(kappa x x^T),
    L_sym = I - D^{-1/2} A D^{-1/2}, k-means over the bottom-k
    eigenvectors (row-normalized).
    """

    def __init__(self, num_clusters: int, concentration: float = 5.0,
                 iterations: int = 10):
        self.num_clusters = num_clusters
        self.concentration = concentration
        self.iterations = iterations

    def __call__(self, x):
        b, n, c = x.shape
        x = common.normalize_embedding(x)
        a = jnp.exp(self.concentration * jnp.einsum('bnc,bmc->bnm', x, x))
        d = jnp.sum(a, axis=-1)
        d_isqrt = jax.lax.rsqrt(jnp.maximum(d, 1e-12))
        lap = (jnp.eye(n)[None]
               - d_isqrt[:, :, None] * a * d_isqrt[:, None, :])
        _, vecs = jnp.linalg.eigh(lap)            # ascending eigenvalues
        feats = vecs[:, :, :self.num_clusters]    # bottom-k eigenvectors
        feats = common.normalize_embedding(feats)
        km = SphericalKMeans(self.num_clusters, self.iterations)
        return km(feats)
