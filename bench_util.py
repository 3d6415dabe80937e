"""Shared helpers for the repo-root benchmark scripts."""


def sync(x):
    """Force device completion: fetch a scalar that depends on the result.

    (On the axon tunnel backend ``block_until_ready`` returns immediately,
    so timing loops must synchronize through a host fetch; execution is
    in-order, so fetching the LAST result fences all queued work.)"""
    import jax
    import numpy as np
    leaves = jax.tree_util.tree_leaves(x)
    for leaf in leaves[-1:]:
        np.asarray(jax.numpy.ravel(leaf)[0])
