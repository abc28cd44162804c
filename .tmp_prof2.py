import numpy as np, time, jax, jax.numpy as jnp
from functools import partial
from soundswallower_tpu.config import Config
from soundswallower_tpu.am import AcousticModel
from soundswallower_tpu.ops import senscore_jax as SJ
from soundswallower_tpu.fe.frontend import Frontend
from soundswallower_tpu.fe.feat import feats_full_utt
from soundswallower_tpu.logmath import SENSCR_SHIFT
cfg = Config(hmm="/root/reference/model/en-us"); cfg.expand()
am = AcousticModel.load(cfg)
t = SJ.ScorerTables.from_am(am)
fe = Frontend(sampling_rate=16000, num_filters=20, lower_filt_freq=130, upper_filt_freq=3700,
              transform="dct", lifter_val=22, remove_noise=True)
raw = np.fromfile("/root/reference/tests/data/goforward.raw", dtype=np.int16)
B = 8
sig = jnp.asarray(np.tile(raw.astype(np.float32), (B,1)))
def bench(f, *a, n=10):
    r = f(*a); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    return (time.time()-t0)/n*1e3
n = len(raw); T = fe.n_frames(n); Tpad = 384
fe_b = jax.jit(jax.vmap(lambda s: fe.mfcc(s, n, Tpad)))
print("fe f64 vmap8:", round(bench(fe_b, sig),1), "ms")
feats_b = jax.jit(jax.vmap(lambda s: feats_full_utt(fe.mfcc(s, n, Tpad), T, "current")))
print("fe+feat vmap8:", round(bench(feats_b, sig),1), "ms")
fts = feats_b(sig)
sc_b = jax.jit(jax.vmap(lambda f: SJ.score_frames(t, f, "fold")))
print("score vmap8:", round(bench(sc_b, fts),1), "ms")
# scoring pieces
d_b = jax.jit(jax.vmap(lambda f: SJ._distances_fold(t, f)))
print("  dist vmap8:", round(bench(d_b, fts),1), "ms")
dt_b = jax.jit(jax.vmap(lambda f: SJ._topn_argmax(SJ._int_dist(SJ._distances_fold(t, f)), 4)))
print("  dist+topn vmap8:", round(bench(dt_b, fts),1), "ms")
