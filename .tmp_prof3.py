import numpy as np, time, jax, jax.numpy as jnp
from soundswallower_tpu.config import Config
from soundswallower_tpu.am import AcousticModel
from soundswallower_tpu.ops import senscore_jax as SJ
cfg = Config(hmm="/root/reference/model/en-us"); cfg.expand()
am = AcousticModel.load(cfg)
t = SJ.ScorerTables.from_am(am)
B, T = 8, 384
rng = np.random.RandomState(0)
di = jnp.asarray(rng.randint(-2**28, 0, size=(B,T,42,3,128)).astype(np.int32))
def bench(f, *a, n=10):
    r = f(*a); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    return round((time.time()-t0)/n*1e3,1)

topn_cur = jax.jit(lambda x: SJ._topn_argmax(x, 4))
print("topn current:", bench(topn_cur, di), "ms")

def topn_2d(x, n=4):
    B,T,C,F,D = x.shape
    x2 = x.reshape(-1, D)
    scores, cws = [], []
    for _ in range(n):
        cw = jnp.argmax(x2, axis=-1)
        sc = jnp.take_along_axis(x2, cw[:,None], axis=-1)[:,0]
        scores.append(sc); cws.append(cw)
        x2 = jnp.where(jnp.arange(D)[None,:] == cw[:,None], jnp.int32(-2**31), x2)
    s = jnp.stack(scores,-1).reshape(B,T,C,F,n)
    c = jnp.stack(cws,-1).astype(jnp.int32).reshape(B,T,C,F,n)
    return s, c
print("topn 2d:", bench(jax.jit(topn_2d), di), "ms")

# top4 via sort? 
def topn_sort(x, n=4):
    s = jax.lax.sort(x, dimension=-1)  # ascending
    sc = s[..., -n:][..., ::-1]
    # need indices too -> sort_key_val
    idx = jnp.broadcast_to(jnp.arange(x.shape[-1], dtype=jnp.int32), x.shape)
    sv, iv = jax.lax.sort_key_val(x, idx, dimension=-1)
    return sv[..., -n:][..., ::-1], iv[..., -n:][..., ::-1]
print("topn sortkv:", bench(jax.jit(topn_sort), di), "ms")

# senone eval variants
sc4, cw4 = topn_cur(di)
s_norm = jnp.minimum(-(sc4 >> 10) + 5, 96)
def sen_gather(cw, s):
    F = 3
    cb_idx = jnp.arange(42)[None,None,:]
    asc = None
    for f in range(F):
        fden = None
        for j in range(4):
            mw = t.mixw_g[f][cb_idx[...,0][0][:,None]*0 + jnp.arange(42)[None,None,:], cw[:,:,:,f,j]] if False else t.mixw_g[f][jnp.arange(42)[None,None,:], cw[:,:,:,f,j]]
            term = mw + s[:,:,:,f,j][...,None]
            fden = term if fden is None else SJ._fast_logadd(fden, term, t.table_thresh)
        asc = fden if asc is None else asc + fden
    return asc
print("seneval gather:", bench(jax.jit(sen_gather), cw4, s_norm), "ms")

mixw_bf = jnp.asarray(np.asarray(t.mixw_g), dtype=jnp.bfloat16)  # [F,cb,D,M]
def sen_onehot(cw, s):
    F = 3
    asc = None
    for f in range(F):
        fden = None
        for j in range(4):
            oh = jax.nn.one_hot(cw[:,:,:,f,j], 128, dtype=jnp.bfloat16)  # [B,T,cb,D]
            mw = jnp.einsum('btcd,cdm->btcm', oh, mixw_bf[f],
                            preferred_element_type=jnp.float32).astype(jnp.int32)
            term = mw + s[:,:,:,f,j][...,None]
            fden = term if fden is None else SJ._fast_logadd(fden, term, t.table_thresh)
        asc = fden if asc is None else asc + fden
    return asc
r1 = jax.jit(sen_gather)(cw4, s_norm); r2 = jax.jit(sen_onehot)(cw4, s_norm)
print("onehot == gather:", bool((np.asarray(r1)==np.asarray(r2)).all()))
print("seneval onehot:", bench(jax.jit(sen_onehot), cw4, s_norm), "ms")
