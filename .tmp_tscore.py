import numpy as np, time, jax
from soundswallower_tpu.config import Config
from soundswallower_tpu.am import AcousticModel
from soundswallower_tpu.ops.senscore_jax import ScorerTables, score_frames
cfg = Config(hmm="/root/reference/model/en-us"); cfg.expand()
am = AcousticModel.load(cfg)
t = ScorerTables.from_am(am)
feat = np.fromfile("tests/golden/goforward-en/feat.f32", dtype=np.float32).reshape(-1,3,13)
gold = np.fromfile("tests/golden/goforward-en/senscr.i16", dtype=np.int16).reshape(-1, am.n_sen)
import jax.numpy as jnp
t0=time.time()
out = np.asarray(score_frames(t, jnp.asarray(feat), "fold"))
print("fold compile+run", round(time.time()-t0,1))
match = (out == gold).all(axis=1)
print("fold: exact frames", match.sum(), "/", len(gold), "maxdiff", np.abs(out.astype(int)-gold).max())
t0=time.time()
out2 = np.asarray(score_frames(t, jnp.asarray(feat), "mxu"))
print("mxu compile+run", round(time.time()-t0,1))
m2 = (out2 == gold).all(axis=1)
print("mxu: exact frames", m2.sum(), "/", len(gold), "maxdiff", np.abs(out2.astype(int)-gold).max())
t0=time.time()
for _ in range(5): r = score_frames(t, jnp.asarray(feat), "mxu")
r.block_until_ready()
print("mxu per-utt:", (time.time()-t0)/5)
