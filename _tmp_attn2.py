import time, jax, jax.numpy as jnp, numpy as np
from vdtpu.ops.attention import _xla_attention
from vdtpu.ops.pallas.flash import flash_attention
def bench(f, *args, n=30):
    o = f(*args); jax.block_until_ready(o); np.asarray(o[0,0,0,0])
    t0=time.perf_counter()
    for _ in range(n): o = f(*args)
    jax.block_until_ready(o); np.asarray(o[0,0,0,0])
    return (time.perf_counter()-t0)/n*1e3
# (B, N, M, H, D): cross-attn + VAE-mid shapes
for (B,N,M,H,D) in [(4,4096,77,8,40),(4,1024,77,8,80),(4,256,77,8,160),
                    (4,64,77,8,160),(4,4096,257,8,40)]:
    q = jax.random.normal(jax.random.PRNGKey(0),(B,N,H,D),jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1),(B,M,H,D),jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2),(B,M,H,D),jnp.bfloat16)
    fx = jax.jit(lambda q,k,v: _xla_attention(q,k,v,None,D**-0.5))
    ff = jax.jit(lambda q,k,v: flash_attention(q,k,v,interpret=False))
    tx = bench(fx,q,k,v)
    try: tf = bench(ff,q,k,v)
    except Exception as e: tf = float('nan'); print("flash fail", e)
    print(f"B{B} N{N} M{M} H{H} D{D}: xla {tx:.2f} ms | flash {tf:.2f} ms", flush=True)
