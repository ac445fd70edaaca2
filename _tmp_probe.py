import time, jax, jax.numpy as jnp
t0=time.time()
from vdtpu.config.bank import model_cfg_bank
from vdtpu.models.vd import VDModel
dtype = jnp.bfloat16
model = VDModel.from_config(model_cfg_bank()("vd_four_flow_v1-0"), dtype=dtype)
print("build", time.time()-t0)
t0=time.time()
params = model.init_params(jax.random.PRNGKey(0))
params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
n = sum(a.size for a in jax.tree_util.tree_leaves(params))
print(f"init {time.time()-t0:.1f}s, {n/1e6:.0f}M params")
t0=time.time()
f = jax.jit(lambda p,x,t,c: model.apply_model(p,x,t,c,"image","text"))
x = jnp.zeros((4,64,64,4),dtype); t = jnp.zeros((4,),jnp.int32); c = jnp.zeros((4,77,768),dtype)
o = f(params,x,t,c); jax.block_until_ready(o)
print(f"single-step compile+run {time.time()-t0:.1f}s")
t0=time.time()
for i in range(10): o = f(params,x,t,c)
jax.block_until_ready(o)
print(f"step {(time.time()-t0)/10*1e3:.1f} ms")
