import numpy as np, time, jax, jax.numpy as jnp
from functools import partial
from soundswallower_tpu.config import Config
from soundswallower_tpu.am import AcousticModel
from soundswallower_tpu.ops import senscore_jax as SJ
cfg = Config(hmm="/root/reference/model/en-us"); cfg.expand()
am = AcousticModel.load(cfg)
t = SJ.ScorerTables.from_am(am)
feat = np.fromfile("tests/golden/goforward-en/feat.f32", dtype=np.float32).reshape(-1,3,13)
feats = jnp.asarray(np.tile(feat, (2,1,1))[:512])  # T=512 bucket

def bench(f, *a, n=20):
    r = f(*a); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    return (time.time()-t0)/n

d_fold = jax.jit(lambda f: SJ._distances_fold(t, f))
d_mxu = jax.jit(lambda f: SJ._distances_mxu(t, f))
print("dist fold:", round(bench(d_fold, feats)*1e3,1), "ms")
print("dist mxu:", round(bench(d_mxu, feats)*1e3,1), "ms")
topk = jax.jit(lambda f: jax.lax.top_k(SJ._int_dist(SJ._distances_fold(t, f)), 4))
print("dist+topk:", round(bench(topk, feats)*1e3,1), "ms")
full = jax.jit(lambda f: SJ.score_frames(t, f, "fold"))
print("full fold:", round(bench(full, feats)*1e3,1), "ms")
full_m = jax.jit(lambda f: SJ.score_frames(t, f, "mxu"))
print("full mxu:", round(bench(full_m, feats)*1e3,1), "ms")
