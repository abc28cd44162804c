import numpy as np, time, jax, jax.numpy as jnp
from soundswallower_tpu.aligner import TpuAligner
al = TpuAligner(hmm="/root/reference/model/en-us")
raw = np.fromfile("/root/reference/tests/data/goforward.raw", dtype=np.int16)
B = 64
audios = [raw]*B; texts = ["go forward ten meters"]*B
segs = al.align_batch(audios, texts)  # warm
import soundswallower_tpu.aligner as A
# instrument: time the three stage calls by monkeypatching? simpler: time sub-steps manually
g = al.graph_for_text(texts[0])
ns = np.array([len(a) for a in audios]); Ts = np.array([al.fe.n_frames(int(n)) for n in ns])
N = int(ns.max()); Tmax = max(128, -(-int(Ts.max())//128)*128)
buf = np.zeros((B, N), np.float32)
for i,a in enumerate(audios): buf[i,:len(a)] = a
t0=time.time()
for _ in range(3):
    segs = al.align_batch(audios, texts)
print("align_batch total:", round((time.time()-t0)/3,3), "s")
# stage timings with chunk=8
chunk = 8
jb = jnp.asarray(buf[:chunk]); jns = jnp.asarray(ns[:chunk]); jTs = jnp.asarray(Ts[:chunk])
out = al._batch_jit(g, jb, jns, jTs, Tmax, "fold")
jax.block_until_ready(out)
t0=time.time()
for _ in range(5):
    out = al._batch_jit(g, jb, jns, jTs, Tmax, "fold")
    jax.block_until_ready(out)
print("chunk8 device:", round((time.time()-t0)/5*1e3,1), "ms")
# extract timing
paths, scores, fsc = (np.asarray(x) for x in out)
t0=time.time()
for i in range(chunk): al._extract(g, paths[i], scores[i], int(Ts[i]), int(fsc[i]))
print("extract per chunk8:", round((time.time()-t0)*1e3,1), "ms")
