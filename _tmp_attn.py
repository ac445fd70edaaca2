import time, jax, jax.numpy as jnp, numpy as np
from vdtpu.ops.attention import _xla_attention
from vdtpu.ops.pallas.flash import flash_attention
def bench(f, *args, n=30):
    o = f(*args); np.asarray(jax.tree_util.tree_leaves(o)[0][0,0,0])
    t0=time.perf_counter()
    for _ in range(n):
        o = f(*args)
    jax.block_until_ready(o); np.asarray(o[0,0,0,0])
    return (time.perf_counter()-t0)/n*1e3
for (B,N,H,D) in [(4,4096,8,40),(4,1024,8,80),(4,256,8,160),(4,4096,8,77)]:
    q = jax.random.normal(jax.random.PRNGKey(0),(B,N,H,D),jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1),(B,N,H,D),jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2),(B,N,H,D),jnp.bfloat16)
    fx = jax.jit(lambda q,k,v: _xla_attention(q,k,v,None,D**-0.5))
    ff = jax.jit(lambda q,k,v: flash_attention(q,k,v,interpret=False))
    tx = bench(fx,q,k,v); tf = bench(ff,q,k,v)
    print(f"B{B} N{N} H{H} D{D}: xla {tx:.2f} ms | flash {tf:.2f} ms", flush=True)
