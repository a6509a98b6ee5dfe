import time
import numpy as np, jax, jax.numpy as jnp
from graph_wavenet_tpu.ops.diffusion import gcn_apply, gcn_init
from graph_wavenet_tpu.ops.pallas.diffusion import fused_gcn
from graph_wavenet_tpu.ops.pallas.gated_tcn import fused_gated_tcn, pack_gate_params, gated_tcn_reference
from graph_wavenet_tpu.ops.temporal import causal_conv_init
rng = np.random.default_rng(0)

def fori_bench(step, x0, iters=100):
    g = jax.jit(lambda x: jax.lax.fori_loop(0, iters, lambda i, v: step(v), x))
    r = g(x0); float(jnp.sum(r))  # warm + full sync
    t0=time.perf_counter(); r = g(x0); float(jnp.sum(r))
    dt1 = time.perf_counter()-t0
    g2 = jax.jit(lambda x: jax.lax.fori_loop(0, 2*iters, lambda i, v: step(v), x))
    r = g2(x0); float(jnp.sum(r))
    t0=time.perf_counter(); r = g2(x0); float(jnp.sum(r))
    dt2 = time.perf_counter()-t0
    return (dt2-dt1)/iters*1e6

N,C,F = 207,32,32
p = gcn_init(jax.random.key(2), C, F, 3, 2)
a = np.stack([rng.random((N,N)).astype(np.float32) for _ in range(3)])
a = jnp.asarray(a/a.sum(-1,keepdims=True))
x0 = jnp.asarray(rng.normal(size=(832,N,C)).astype(np.float32))
flops=2*832*(3*2*207*207*32 + 7*207*32*32)

us = fori_bench(lambda x: jnp.tanh(gcn_apply(p, x[None], [a[0],a[1],a[2]], order=2, mode='fused')[0]), x0)
print(f"xla gcn: {us:.0f}us = {flops/us/1e6:.1f} TFLOPS", flush=True)
us = fori_bench(lambda x: jnp.tanh(gcn_apply(p, x[None], [a[0],a[1],a[2]], order=2, mode='concat')[0]), x0)
print(f"xla gcn concat: {us:.0f}us = {flops/us/1e6:.1f} TFLOPS", flush=True)
us = fori_bench(lambda x: jnp.tanh(fused_gcn(x,a,p['w'],p['b'],2,3,8,False)), x0, iters=20)
print(f"pallas gcn rb8: {us:.0f}us = {flops/us/1e6:.1f} TFLOPS", flush=True)

pf = causal_conv_init(jax.random.key(0), C, F, 2)
pg = causal_conv_init(jax.random.key(1), C, F, 2)
xg = jnp.asarray(rng.normal(size=(64,13,N,C)).astype(np.float32))
w,b = pack_gate_params(pf,pg)
gflops = 2*64*11*207*32*64*2
pad = lambda y: jnp.pad(y, ((0,0),(2,0),(0,0),(0,0)))
us = fori_bench(lambda x: pad(fused_gated_tcn(x,w,b,2,False)), xg)
print(f"pallas gated: {us:.0f}us = {gflops/us/1e6:.2f} TFLOPS", flush=True)
us = fori_bench(lambda x: pad(gated_tcn_reference({'w':w[...,:F],'b':b[:F]},{'w':w[...,F:],'b':b[F:]},x,2)), xg)
print(f"xla gated: {us:.0f}us = {gflops/us/1e6:.2f} TFLOPS", flush=True)
