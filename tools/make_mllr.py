"""Synthesize a deterministic MLLR transform file for parity testing.

The format is ps_mllr.c:47-130's text layout: n_class, n_feat, then per
stream: veclen followed by per class the A rotation (veclen x veclen),
bias b, and variance scale h.  The transform is a mild but non-trivial
perturbation (scaled rotation + bias + per-dim variance scaling) so a
decode with it produces clearly different senone scores, exercising
acmod_update_mllr (acmod.c:316-325) and gauden_mllr_transform
(ms_gauden.c:460-539) end to end.

Usage: python tools/make_mllr.py <out_path> [n_feat] [veclen]
"""

import sys

import numpy as np


def make_mllr(out_path: str, n_feat: int = 3, veclen: int = 13,
              n_class: int = 1, seed: int = 42) -> str:
    rng = np.random.RandomState(seed)
    with open(out_path, "w") as fh:
        fh.write(f"{n_class}\n{n_feat}\n")
        for f in range(n_feat):
            fh.write(f"{veclen}\n")
            for m in range(n_class):
                A = (np.eye(veclen) * (1.0 + 0.05 * (f + 1))
                     + rng.uniform(-0.02, 0.02, (veclen, veclen)))
                b = rng.uniform(-0.5, 0.5, veclen)
                h = rng.uniform(0.8, 1.25, veclen)
                for row in A.astype(np.float32):
                    fh.write(" ".join(f"{x:.8e}" for x in row) + "\n")
                fh.write(" ".join(f"{x:.8e}" for x in b.astype(np.float32))
                         + "\n")
                fh.write(" ".join(f"{x:.8e}" for x in h.astype(np.float32))
                         + "\n")
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mllr_test"
    n_feat = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    veclen = int(sys.argv[3]) if len(sys.argv) > 3 else 13
    make_mllr(out, n_feat, veclen)
    print("wrote", out)
