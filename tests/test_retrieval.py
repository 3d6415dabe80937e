"""Retrieval pair augmentation + looped capture (pipeline/compute_matches
``retrieval_pairs``, ingest/synth ``make_city(loop=True)``).

A windowed pair list on a sequential capture misses loop closures; the
pooled-descriptor retrieval recovers them (the vocab-tree practice the
reference's exhaustive pair loop subsumes, src/R3DComputeMatches.cpp:2042).
"""

import numpy as np
import jax.numpy as jnp

from regard3d_tpu.core.types import Descriptors
from regard3d_tpu.ingest import synth
from regard3d_tpu.pipeline import compute_matches as cm


def _descs_with_clusters(V, N, D, cluster_of, seed=0):
    """Image i's descriptors concentrate on axis cluster_of[i]."""
    rng = np.random.default_rng(seed)
    data = np.abs(rng.normal(size=(V, N, D)).astype(np.float32)) * 0.05
    for i in range(V):
        data[i, :, cluster_of[i]] += 1.0
    mask = np.ones((V, N), bool)
    return Descriptors(data=jnp.asarray(data), mask=jnp.asarray(mask))


def test_retrieval_pairs_find_clusters():
    V, N, D = 12, 16, 8
    cluster = np.arange(V) % 3            # images 0,3,6,9 alike, etc.
    descs = _descs_with_clusters(V, N, D, cluster)
    pairs = cm.retrieval_pairs(descs, k=3)
    assert pairs == sorted(set(pairs))
    assert all(i < j for i, j in pairs)
    # every retrieved pair joins images of the same cluster
    assert all(cluster[i] == cluster[j] for i, j in pairs)
    # and every image is connected to its cluster mates
    for i in range(V):
        assert any(i in pr for pr in pairs)


def test_retrieval_pairs_exclude_and_determinism():
    V, N, D = 8, 8, 6
    descs = _descs_with_clusters(V, N, D, np.zeros(V, int))
    p1 = cm.retrieval_pairs(descs, k=2)
    p2 = cm.retrieval_pairs(descs, k=2)
    assert p1 == p2
    excl = set(p1[:3])
    p3 = cm.retrieval_pairs(descs, k=2, exclude=excl)
    assert not excl & set(p3)


def test_sequential_pairs():
    pairs = cm.sequential_pairs(5, 2)
    assert pairs == [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (2, 4),
                     (3, 4)]


def test_city_loop_closes():
    ds = synth.make_city(n_cams=200, hw=48, loop=True)
    Cs = ds["Cs"]
    extent = np.linalg.norm(Cs.max(0) - Cs.min(0))
    # the tail re-traverses the head: endpoints close relative to extent
    assert np.linalg.norm(Cs[0] - Cs[-1]) < 0.45 * extent
    # and images carry texture
    assert all(im.std() > 0.01 for im in ds["images"])
