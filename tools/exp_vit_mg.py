"""Isolate the multi-graph Viterbi cost: shared-graph vs per-lane graph
tensors at IDENTICAL shapes, on the real TPU."""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from soundswallower_tpu.ops.align_jax import align_viterbi_batch


def bench(fn, reps=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    B = int(os.environ.get("B", "64"))
    T = int(os.environ.get("T", "384"))
    P = int(os.environ.get("P", "64"))
    K = int(os.environ.get("K", "2"))
    E = 3
    S = P * E
    rng = np.random.RandomState(0)
    sen = jnp.asarray(rng.randint(0, 500, (B, T, S)).astype(np.int32))
    tp1 = rng.randint(-200, 0, (P, E, E + 1)).astype(np.int32)
    pi1 = rng.randint(0, P, (P, K)).astype(np.int32)
    pp1 = rng.randint(-100, 0, (P, K)).astype(np.int32)
    pk1 = rng.rand(P, K) < 0.8
    ast1 = np.zeros(P, np.int32)
    aen1 = np.full(P, 1 << 30, np.int32)
    ent1 = np.full(P, -0x20000000, np.int32)
    ent1[0] = 0
    Ts = jnp.asarray(np.full(B, T, np.int32))

    shared = dict(tp=jnp.asarray(tp1), pi=jnp.asarray(pi1),
                  pp=jnp.asarray(pp1), pk=jnp.asarray(pk1),
                  ast=jnp.asarray(ast1), aen=jnp.asarray(aen1),
                  ent=jnp.asarray(ent1))

    def run_shared():
        return align_viterbi_batch(sen, shared["tp"], shared["pi"],
                                   shared["pp"], shared["pk"], shared["ast"],
                                   shared["aen"], Ts, False, shared["ent"])

    d = bench(run_shared)
    print(f"shared   B={B} T={T} P={P} K={K}: {d*1000:8.2f} ms "
          f"({d/T*1e6:6.1f} us/step)", flush=True)

    perlane = dict(
        tp=jnp.asarray(np.broadcast_to(tp1, (B, P, E, E + 1)).copy()),
        pi=jnp.asarray(np.broadcast_to(pi1, (B, P, K)).copy()),
        pp=jnp.asarray(np.broadcast_to(pp1, (B, P, K)).copy()),
        pk=jnp.asarray(np.broadcast_to(pk1, (B, P, K)).copy()),
        ast=jnp.asarray(np.broadcast_to(ast1, (B, P)).copy()),
        aen=jnp.asarray(np.broadcast_to(aen1, (B, P)).copy()),
        ent=jnp.asarray(np.broadcast_to(ent1, (B, P)).copy()))

    def run_perlane():
        return align_viterbi_batch(sen, perlane["tp"], perlane["pi"],
                                   perlane["pp"], perlane["pk"],
                                   perlane["ast"], perlane["aen"], Ts, False,
                                   perlane["ent"])

    d = bench(run_perlane)
    print(f"per-lane B={B} T={T} P={P} K={K}: {d*1000:8.2f} ms "
          f"({d/T*1e6:6.1f} us/step)", flush=True)

    # banded per-lane: offsets <= W
    W = int(os.environ.get("W", "8"))
    pi_b = np.maximum(np.arange(P)[:, None] - rng.randint(1, W + 1, (P, K)),
                      0).astype(np.int32)
    band_pen = np.full((B, W, P), -(1 << 30), np.int32)
    band_ok = np.zeros((B, W, P), bool)
    for p in range(P):
        for k in range(K):
            dd = p - pi_b[p, k]
            if 1 <= dd <= W and pk1[p, k]:
                band_pen[:, W - dd, p] = pp1[p, k]
                band_ok[:, W - dd, p] = True

    def run_band():
        return align_viterbi_batch(sen, perlane["tp"], perlane["pi"],
                                   perlane["pp"], perlane["pk"],
                                   perlane["ast"], perlane["aen"], Ts, False,
                                   perlane["ent"],
                                   band_pen=jnp.asarray(band_pen),
                                   band_ok=jnp.asarray(band_ok))

    d = bench(run_band)
    print(f"banded   B={B} T={T} P={P} W={W}: {d*1000:8.2f} ms "
          f"({d/T*1e6:6.1f} us/step)", flush=True)

    # shared-graph tensors but per-lane band (isolates tp layout cost):
    def run_band_sharedtp():
        return align_viterbi_batch(sen, shared["tp"], shared["pi"],
                                   shared["pp"], shared["pk"],
                                   perlane["ast"], perlane["aen"], Ts, False,
                                   perlane["ent"],
                                   band_pen=jnp.asarray(band_pen),
                                   band_ok=jnp.asarray(band_ok))
    try:
        d = bench(run_band_sharedtp)
        print(f"band+shtp B={B} T={T} P={P} W={W}: {d*1000:8.2f} ms "
              f"({d/T*1e6:6.1f} us/step)", flush=True)
    except Exception as e:
        print("band+shtp failed:", type(e).__name__, flush=True)


if __name__ == "__main__":
    main()
