import time
import numpy as np, jax, jax.numpy as jnp
from graph_wavenet_tpu.ops.diffusion import gcn_apply, gcn_init
from graph_wavenet_tpu.ops.pallas.diffusion import fused_gcn
from graph_wavenet_tpu.ops.pallas.gated_tcn import fused_gated_tcn, pack_gate_params, gated_tcn_reference
from graph_wavenet_tpu.ops.temporal import causal_conv_init
rng = np.random.default_rng(0)

def bench_chain(f, x0, *args, n=50):
    # x_{i+1} = normalize(f(x_i)): every call depends on the previous
    x = jax.block_until_ready(f(x0, *args))
    t0=time.perf_counter()
    for _ in range(n): x = f(x, *args)
    jax.block_until_ready(x)
    return (time.perf_counter()-t0)/n*1e6

# calibrate: chained matmul
for m in (2048, 4096):
    A = jnp.asarray(rng.normal(size=(m,m)).astype(np.float32))/m
    f = jax.jit(lambda x, a: x@a)
    us = bench_chain(f, A, A)
    print(f"chained matmul {m}: {us:.0f}us = {2*m**3/us/1e6:.1f} TFLOPS", flush=True)

N,C,F = 207,32,32
p = gcn_init(jax.random.key(2), C, F, 3, 2)
a = np.stack([rng.random((N,N)).astype(np.float32) for _ in range(3)])
a = jnp.asarray(a/a.sum(-1,keepdims=True))
x0 = jnp.asarray(rng.normal(size=(832,N,C)).astype(np.float32))
flops=2*832*(3*2*207*207*32 + 7*207*32*32)

fx = jax.jit(lambda x,a,w,b: jnp.tanh(gcn_apply({'w':w,'b':b}, x[None], [a[0],a[1],a[2]], order=2, mode='fused')[0]))
us = bench_chain(fx, x0, a, p['w'], p['b'])
print(f"xla gcn chained {us:.0f}us = {flops/us/1e6:.1f} TFLOPS", flush=True)

fp = jax.jit(lambda x,a,w,b: jnp.tanh(fused_gcn(x,a,w,b,2,3,8,False)))
us = bench_chain(fp, x0, a, p['w'], p['b'])
print(f"pallas gcn rb=8 chained {us:.0f}us = {flops/us/1e6:.1f} TFLOPS", flush=True)

# gated tcn chained (shape-preserving via pad back)
pf = causal_conv_init(jax.random.key(0), C, F, 2)
pg = causal_conv_init(jax.random.key(1), C, F, 2)
xg = jnp.asarray(rng.normal(size=(64,13,N,C)).astype(np.float32))
w,b = pack_gate_params(pf,pg)
gflops = 2*64*11*207*32*64*2
fgp = jax.jit(lambda x,w,b: jnp.pad(fused_gated_tcn(x,w,b,2,False), ((0,0),(2,0),(0,0),(0,0))))
us = bench_chain(fgp, xg, w, b)
print(f"pallas gated chained {us:.0f}us = {gflops/us/1e6:.2f} TFLOPS", flush=True)
fgx = jax.jit(lambda x,w,b: jnp.pad(gated_tcn_reference({'w':w[...,:F],'b':b[:F]},{'w':w[...,F:],'b':b[F:]},x,2), ((0,0),(2,0),(0,0),(0,0))))
us = bench_chain(fgx, xg, w, b)
print(f"xla gated chained {us:.0f}us = {gflops/us/1e6:.2f} TFLOPS", flush=True)
