import time
import numpy as np, jax, jax.numpy as jnp
print("start", flush=True)
from graph_wavenet_tpu.ops.pallas.diffusion import fused_gcn
from graph_wavenet_tpu.ops.pallas.gated_tcn import fused_gated_tcn, pack_gate_params, gated_tcn_reference
from graph_wavenet_tpu.ops.temporal import causal_conv_init
from graph_wavenet_tpu.ops.diffusion import gcn_init, gcn_apply
rng = np.random.default_rng(0)
N,C,F = 207,32,32
p = gcn_init(jax.random.key(2), C, F, 3, 2)
a = np.stack([rng.random((N,N)).astype(np.float32) for _ in range(3)])
a = jnp.asarray(a/a.sum(-1,keepdims=True))
xr = jnp.asarray(rng.normal(size=(832,N,C)).astype(np.float32))

@jax.jit
def ref(x,a,w,b):
    return gcn_apply({'w':w,'b':b}, x[None], [a[0],a[1],a[2]], order=2, mode='fused')[0]
t0=time.perf_counter(); want = ref(xr,a,p['w'],p['b']); jax.block_until_ready(want)
print(f"xla ref compile {time.perf_counter()-t0:.1f}s", flush=True)

def bench(f, *args, n=100):
    jax.block_until_ready(f(*args))
    t0=time.perf_counter()
    for _ in range(n): r=f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1e6
print(f"xla gcn {bench(ref,xr,a,p['w'],p['b']):.0f}us", flush=True)

for rb in (8, 16):
    t0=time.perf_counter()
    f = jax.jit(lambda x,a,w,b,rb=rb: fused_gcn(x,a,w,b,2,3,rb,False))
    @jax.jit
    def err(x,a,w,b,f=f):
        return jnp.abs(f(x,a,w,b)-ref(x,a,w,b)).max()
    e = err(xr,a,p['w'],p['b']); jax.block_until_ready(e)
    print(f"rb={rb} compile {time.perf_counter()-t0:.1f}s err {float(e):.2e}", flush=True)
    print(f"rb={rb} pallas gcn {bench(f,xr,a,p['w'],p['b']):.0f}us", flush=True)

# gated
pf = causal_conv_init(jax.random.key(0), C, F, 2)
pg = causal_conv_init(jax.random.key(1), C, F, 2)
x4 = jnp.asarray(rng.normal(size=(64,13,N,C)).astype(np.float32))
w,b = pack_gate_params(pf,pg)
fg = jax.jit(lambda x,w,b: fused_gated_tcn(x,w,b,2,False))
fg_ref = jax.jit(lambda x: gated_tcn_reference(pf,pg,x,2))
@jax.jit
def gerr(x,w,b):
    return jnp.abs(fg(x,w,b)-fg_ref(x)).max()
t0=time.perf_counter(); e=gerr(x4,w,b); jax.block_until_ready(e)
print(f"gated compile {time.perf_counter()-t0:.1f}s err {float(e):.2e}", flush=True)
print(f"gated pallas {bench(fg,x4,w,b):.0f}us  xla {bench(fg_ref,x4):.0f}us", flush=True)
