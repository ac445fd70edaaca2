import time, sys, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/vdtpu-jax-cache")
from vdtpu.config.bank import model_cfg_bank
from vdtpu.models.vd import VDModel
from vdtpu.sampling.ddim import DDIMTables, cfg_eps_fn, ddim_scan
dtype = jnp.bfloat16
model = VDModel.from_config(model_cfg_bank()("vd_four_flow_v1-0"), dtype=dtype)
shapes = jax.eval_shape(lambda k: model.init_params(k, jit=False), jax.random.PRNGKey(0))
leaves, treedef = jax.tree_util.tree_flatten(shapes)
key = jax.random.PRNGKey(0)
params = treedef.unflatten([jax.random.normal(jax.random.fold_in(key,i), l.shape, jnp.bfloat16)*0.02 for i,l in enumerate(leaves)])
jax.block_until_ready(params)
print("params ready", flush=True)
tables = DDIMTables.create(model.schedule, 50, eta=0.0)
cond = jax.random.normal(jax.random.PRNGKey(5),(2,77,768),dtype)
uncond = jnp.zeros((2,77,768),dtype)
@jax.jit
def t2i(params, cond, uncond, k):
    eps = cfg_eps_fn(lambda x,t,c: model.apply_model(params,x,t,c,"image","text"), cond, uncond, 7.5)
    x = jax.random.normal(k,(2,64,64,4),dtype)
    return ddim_scan(eps, x, k, tables)
k = jax.random.PRNGKey(42)
o = t2i(params, cond, uncond, k); v=np.asarray(o[0,0,0,:4]); print("warm done", v, flush=True)
for i in range(4):
    t0=time.perf_counter()
    o = t2i(params, cond, uncond, jax.random.fold_in(k,i))
    jax.block_until_ready(o)
    t1=time.perf_counter()
    v = np.asarray(o[0,0,0,0])  # force real transfer
    t2=time.perf_counter()
    print(f"run{i}: block={t1-t0:.3f}s  +transfer={t2-t1:.3f}s  val={float(v):.4f}", flush=True)
