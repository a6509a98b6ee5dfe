import numpy as np, jax, jax.numpy as jnp, time
from graph_wavenet_tpu.ops.pallas.gated_tcn import fused_gated_tcn, pack_gate_params, gated_tcn_reference
from graph_wavenet_tpu.ops.pallas.diffusion import fused_gcn
from graph_wavenet_tpu.ops.temporal import causal_conv_init
from graph_wavenet_tpu.ops.diffusion import gcn_init, gcn_apply
rng = np.random.default_rng(0)
B,T,N,C,F = 64,13,207,32,32
pf = causal_conv_init(jax.random.key(0), C, F, 2)
pg = causal_conv_init(jax.random.key(1), C, F, 2)
x = jnp.asarray(rng.normal(size=(B,T,N,C)).astype(np.float32))
w,b = pack_gate_params(pf,pg)
f_gate = jax.jit(lambda x,w,b: fused_gated_tcn(x,w,b,2,False))
got = f_gate(x,w,b)
want = gated_tcn_reference(pf,pg,x,2)
print('gated tcn max err', float(jnp.abs(got-want).max()), flush=True)

p = gcn_init(jax.random.key(2), C, F, 3, 2)
a = np.stack([rng.random((N,N)).astype(np.float32) for _ in range(3)])
a = jnp.asarray(a/a.sum(-1,keepdims=True))
xr = x.reshape(B*T,N,C)
f_gcn = jax.jit(lambda x,a,w,b: fused_gcn(x,a,w,b,2,3,64,False))
got = f_gcn(xr,a,p['w'],p['b'])
want = gcn_apply(p, xr[None], [a[0],a[1],a[2]], order=2, mode='concat')[0]
print('gcn max err', float(jnp.abs(got-want).max()), flush=True)

# microbench vs XLA
f_gcn_xla = jax.jit(lambda x,a,w,b: gcn_apply({'w':w,'b':b}, x[None], [a[0],a[1],a[2]], order=2, mode='fused')[0])
f_gate_xla = jax.jit(lambda x: gated_tcn_reference(pf,pg,x,2))
def bench(f, *args, n=100):
    jax.block_until_ready(f(*args))
    t0=time.perf_counter()
    for _ in range(n): r=f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1e6
print(f'gated pallas {bench(f_gate,x,w,b):.1f}us  xla {bench(f_gate_xla,x):.1f}us', flush=True)
print(f'gcn   pallas {bench(f_gcn,xr,a,p["w"],p["b"]):.1f}us  xla {bench(f_gcn_xla,xr,a,p["w"],p["b"]):.1f}us', flush=True)
