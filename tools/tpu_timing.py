"""Trustworthy TPU timing helpers for the axon platform.

On this platform `jax.block_until_ready` returns before device execution
finishes (dispatch is fully lazy until a host fetch), so any timing loop
that relies on it measures only host-side dispatch.  `sync()` forces
execution by fetching one element of the result to the host; timings
bracketed by sync() are real wall clock including device compute.
"""

import time

import jax
import numpy as np


def sync(x):
    """Force execution of x (any pytree of jax arrays) with a minimal
    host fetch."""
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.numpy.ravel(leaf)[0])
    return x


def timeit(name, fn, reps=3, inner=1):
    """Time fn() with proper sync; prints and returns (result, seconds)."""
    out = fn()
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        for _ in range(inner):
            out = fn()
        sync(out)
    dt = (time.time() - t0) / (reps * inner)
    print(f"{name:40s} {dt*1e3:9.2f} ms")
    return out, dt
