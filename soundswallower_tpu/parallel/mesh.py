"""Device mesh + sharding helpers for batched decoding/alignment.

The reference is strictly single-threaded (SURVEY.md section 2.3); all
parallelism here is new TPU-native design:

* data axis: utterance batches sharded across chips; every utterance's
  state (CMN, Viterbi scores, token stacks) lives with its shard
* model tables (means/variances/mixw, a few MB) are replicated
* cross-host batches ride DCN only at dispatch; per-chip compute uses
  ICI collectives only if sequence parallelism is enabled (future work:
  ring-carried Viterbi state for long-form audio)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of [B, ...] arrays with B sharded over 'data'."""
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(put, tree)
