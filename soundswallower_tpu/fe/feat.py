"""Dynamic feature computation: MFCC -> model feature vectors.

Reimplements ``src/feat.c`` (1s_c_d_dd at :588-632, block-utterance path at
:977-1007) and ``src/cmn.c`` batch CMN (:159-225), with float32 arithmetic
matching the C order of operations:

* CMN batch ("current"): per-dim float32 running sum over frames in frame
  order, skipping frames whose c0 < 0; mean = sum/nframe (float32 divide);
  mean subtracted from every frame (cmn.c:159-225).
* Edge padding: first/last frame replicated ``win`` times *after* CMN
  (feat_s2mfc2feat_block_utt, feat.c:977-1007).
* 1s_c_d_dd: d[t] = c[t+2]-c[t-2]; dd[t] = (c[t+3]-c[t-1])-(c[t+1]-c[t-3])
  (feat_1s_c_d_dd_cep2feat, feat.c:588-632); all float32 subtractions.
* Subvector projection 0-12/13-25/26-38 is a reshape to 3 streams of 13
  (parse_subvecs/feat_subvec_project, feat.c:181,346).

Everything here is jittable JAX; the scan for CMN keeps the exact float32
accumulation order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

FEAT_DCEP_WIN = 2
WIN = FEAT_DCEP_WIN + 1  # feat window size for 1s_c_d_dd


# ---------------------------------------------------------------------------
# Exact host (numpy) reference path.
#
# XLA with --xla_allow_excess_precision (the default in some deployments) may
# evaluate f32 chains in f64 on CPU, which breaks bit-parity of the float32
# accumulation in CMN.  The numpy path below is the exactness oracle used by
# the decoder's parity-critical path and by tests; the jitted path is used
# for batched TPU throughput (where f32 is native and exact anyway).
# ---------------------------------------------------------------------------

def cmn_batch_np(cep: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Batch CMN, exact float32 (cmn(), src/cmn.c:159-225)."""
    s = np.zeros(cep.shape[1], np.float32)
    n = 0
    for f in range(len(cep)):
        if cep[f, 0] < 0:
            continue
        s = (s + cep[f]).astype(np.float32)
        n += 1
    mean = (s / np.float32(n)).astype(np.float32)
    return (cep - mean[None, :]).astype(np.float32), mean


def feats_full_utt_np(cep: np.ndarray, cmn_mode: str = "batch") -> np.ndarray:
    """Exact host path: [T, ncep] float32 -> [T, 3, ncep] float32.

    Mirrors feat_s2mfc2feat_block_utt (feat.c:977-1007): CMN, then edge
    replication by WIN frames, then 1s_c_d_dd dynamic features.
    """
    if cmn_mode in ("batch", "current"):
        cep, _ = cmn_batch_np(cep)
    T, ncep = cep.shape
    padded = np.concatenate(
        [np.tile(cep[0], (WIN, 1)), cep, np.tile(cep[-1], (WIN, 1))], axis=0
    ).astype(np.float32)
    c = padded[WIN : WIN + T]
    d = (padded[WIN + 2 : WIN + T + 2] - padded[WIN - 2 : WIN + T - 2]).astype(np.float32)
    d1 = (padded[WIN + 3 : WIN + T + 3] - padded[WIN - 1 : WIN + T - 1]).astype(np.float32)
    d2 = (padded[WIN + 1 : WIN + T + 1] - padded[WIN - 3 : WIN + T - 3]).astype(np.float32)
    dd = (d1 - d2).astype(np.float32)
    return np.stack([c, d, dd], axis=1)


@partial(jax.jit, static_argnums=())
def cmn_batch(cep, n_frames):
    """Batch CMN over the first n_frames rows of cep [T, ncep] float32.

    Returns (cep_normalized, mean).  Frames with c0 < 0 are excluded from
    the mean but still normalized (cmn.c:175-196).
    """
    T = cep.shape[0]
    idx = jnp.arange(T)
    valid = (idx < n_frames) & (cep[:, 0] >= 0)

    def step(carry, x):
        s, n = carry
        frame, v = x
        s = jnp.where(v, s + frame, s)  # float32 add in frame order
        n = jnp.where(v, n + 1, n)
        return (s, n), None

    (s, n), _ = jax.lax.scan(
        step, (jnp.zeros(cep.shape[1], jnp.float32), jnp.int32(0)), (cep, valid)
    )
    mean = s / n.astype(jnp.float32)
    return cep - mean[None, :], mean


def compute_feat_1s_c_d_dd(cep_padded):
    """[T + 2*WIN, ncep] padded cepstra -> [T, 3*ncep] features (float32)."""
    c = cep_padded[WIN:-WIN]
    d = cep_padded[WIN + 2 : cep_padded.shape[0] - WIN + 2] - \
        cep_padded[WIN - 2 : cep_padded.shape[0] - WIN - 2]
    d1 = cep_padded[WIN + 3 : cep_padded.shape[0] - WIN + 3] - \
        cep_padded[WIN - 1 : cep_padded.shape[0] - WIN - 1]
    d2 = cep_padded[WIN + 1 : cep_padded.shape[0] - WIN + 1] - \
        cep_padded[WIN - 3 : cep_padded.shape[0] - WIN - 3]
    dd = d1 - d2
    return jnp.concatenate([c, d, dd], axis=-1)


@partial(jax.jit, static_argnums=(2,))
def feats_full_utt(cep, n_frames, cmn_mode: str = "batch"):
    """Full-utterance features: [T, ncep] -> [T, 3, ncep] float32.

    Mirrors acmod_process_full_cep -> feat_s2mfc2feat_live(beginutt=endutt=1)
    -> feat_s2mfc2feat_block_utt.  Rows >= n_frames are garbage (masked by
    caller).  The edge replication uses rows 0 and n_frames-1.
    """
    if cmn_mode in ("batch", "current"):
        cep, _ = cmn_batch(cep, n_frames)
    T, ncep = cep.shape
    first = cep[0]
    last = cep[jnp.maximum(n_frames - 1, 0)]
    # Build padded array [T + 2*WIN, ncep]: WIN copies of first, the data
    # (rows >= n_frames replaced by `last` so the tail windows replicate),
    idx = jnp.arange(T)
    body = jnp.where((idx < n_frames)[:, None], cep, last[None, :])
    padded = jnp.concatenate(
        [jnp.tile(first[None, :], (WIN, 1)), body, jnp.tile(last[None, :], (WIN, 1))],
        axis=0,
    )
    feat = compute_feat_1s_c_d_dd(padded)  # [T, 3*ncep]
    return feat.reshape(T, 3, ncep)
