import time, sys, jax, jax.numpy as jnp, numpy as np
from vdtpu.config.bank import model_cfg_bank
from vdtpu.models.vd import VDModel
from vdtpu.sampling.ddim import DDIMTables, cfg_eps_fn, ddim_scan
dtype = jnp.bfloat16
model = VDModel.from_config(model_cfg_bank()("vd_four_flow_v1-0"), dtype=dtype, use_checkpoint=False)
shapes = jax.eval_shape(lambda k: model.init_params(k, jit=False), jax.random.PRNGKey(0))
leaves, treedef = jax.tree_util.tree_flatten(shapes)
key = jax.random.PRNGKey(0)
params = treedef.unflatten([jax.random.normal(jax.random.fold_in(key,i), l.shape, jnp.bfloat16)*0.02 for i,l in enumerate(leaves)])
jax.block_until_ready(params); print("params ready", flush=True)
tables = DDIMTables.create(model.schedule, 50, eta=0.0)
for n in [8, 16]:
    cond = jax.random.normal(jax.random.PRNGKey(5),(n,77,768),dtype)
    uncond = jnp.zeros((n,77,768),dtype)
    @jax.jit
    def t2i(params, cond, uncond, k):
        eps = cfg_eps_fn(lambda x,t,c: model.apply_model(params,x,t,c,"image","text"), cond, uncond, 7.5)
        x = jax.random.normal(k,(n,64,64,4),dtype)
        return ddim_scan(eps, x, k, tables)
    k = jax.random.PRNGKey(42)
    t0=time.time(); o = t2i(params, cond, uncond, k); jax.block_until_ready(o); np.asarray(o[0,0,0,0])
    print(f"n={n} compile {time.time()-t0:.0f}s", flush=True)
    ts=[]
    for i in range(3):
        t0=time.perf_counter(); o = t2i(params, cond, uncond, jax.random.fold_in(k,i))
        jax.block_until_ready(o); np.asarray(o[0,0,0,0]); ts.append(time.perf_counter()-t0)
    dt=sorted(ts)[1]
    print(f"n={n}: {dt:.2f}s per 50-step run -> {n/dt:.2f} img/s (scan only)", flush=True)
