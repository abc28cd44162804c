"""Multi-host glue: single-process degenerate behavior on the 8-device
CPU mesh (true multi-process DCN runs need multiple hosts; the global
mesh + local-data assembly path is what's exercised here)."""

import numpy as np

import jax
import jax.numpy as jnp

from soundswallower_tpu.parallel.multihost import (
    global_data_mesh, host_batch_to_global, initialize, local_results)


def test_global_mesh_and_assembly():
    initialize(None)  # no-op single process
    mesh = global_data_mesh()
    assert mesh.devices.size == len(jax.devices())
    B = mesh.devices.size * 2
    x = np.arange(B * 3, dtype=np.float32).reshape(B, 3)
    g = host_batch_to_global(mesh, x)
    assert g.shape == (B, 3)
    # a jitted step over the global mesh sees the full batch
    y = jax.jit(lambda a: a * 2)(g)
    back = local_results(y)
    assert (back == x * 2).all()
