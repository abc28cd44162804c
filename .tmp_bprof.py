import numpy as np, time, jax, jax.numpy as jnp
from soundswallower_tpu.aligner import TpuAligner
from soundswallower_tpu.fe.feat import feats_full_utt
from soundswallower_tpu.ops.senscore_jax import score_frames
from soundswallower_tpu.ops.align_jax import align_viterbi, backtrace, WORST_SCORE
al = TpuAligner(hmm="/root/reference/model/en-us")
raw = np.fromfile("/root/reference/tests/data/goforward.raw", dtype=np.int16)
B = 8
g = al.graph_for_text("go forward ten meters")
buf = jnp.asarray(np.tile(raw.astype(np.float32), (B,1)))
n = len(raw); T = al.fe.n_frames(n); Tmax = 384
Ts = jnp.full((B,), T, jnp.int32); ns = jnp.full((B,), n, jnp.int32)
def bench(f, *a, rep=10):
    r = f(*a); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(rep): r = f(*a)
    jax.block_until_ready(r)
    return round((time.time()-t0)/rep*1e3,1)
fe_f = jax.jit(jax.vmap(lambda s, n_, T_: feats_full_utt(al.fe.mfcc(s, n_, Tmax), T_, "current")))
print("fe+feat:", bench(fe_f, buf, ns, Ts), "ms")
feats = fe_f(buf, ns, Ts)
sc_f = jax.jit(jax.vmap(lambda f: score_frames(al.tables, f, "fold")))
print("score:", bench(sc_f, feats), "ms")
senscr = sc_f(feats)
entry = jnp.asarray(np.where(g.is_entry, g.entry_pen, WORST_SCORE).astype(np.int32))
senid = jnp.asarray(al.tables.sen_remap[g.senid].astype(np.int32))
tp = al.tmat_i32[jnp.asarray(g.tmatid)]
args = (senid, tp, jnp.asarray(g.edge_src), jnp.asarray(g.edge_dst), jnp.asarray(g.edge_pen),
        jnp.asarray(g.astart), jnp.asarray(g.aend))
vit_f = jax.jit(jax.vmap(lambda s, T_: align_viterbi(s, *args, T_, entry)))
print("viterbi:", bench(vit_f, senscr, Ts), "ms")
tok_id, tok_score, out_score, out_hist = vit_f(senscr, Ts)
fin = jnp.asarray(g.final_nodes)
bt_f = jax.jit(jax.vmap(lambda ti, ts, oh, os_, T_: backtrace(ti, ts, oh[fin[jnp.argmax(os_[fin])]], os_[fin[jnp.argmax(os_[fin])]], T_)))
print("backtrace:", bench(bt_f, tok_id, tok_score, out_hist, out_score, Ts), "ms")
