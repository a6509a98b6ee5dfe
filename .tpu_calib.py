import time
import numpy as np, jax, jax.numpy as jnp
from graph_wavenet_tpu.ops.diffusion import gcn_apply, gcn_init
rng = np.random.default_rng(0)

def bench(f, *args, n=50):
    jax.block_until_ready(f(*args))
    t0=time.perf_counter()
    for _ in range(n): r=f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1e6

# calibrate with a big matmul
for m in (2048, 4096):
    A = jnp.asarray(rng.normal(size=(m,m)).astype(np.float32))
    f = jax.jit(lambda a,b: a@b)
    us = bench(f, A, A)
    print(f"matmul {m}: {us:.0f}us = {2*m**3/us/1e6:.1f} TFLOPS", flush=True)

# gcn again, with fresh input each call to rule out caching
N,C,F = 207,32,32
p = gcn_init(jax.random.key(2), C, F, 3, 2)
a = np.stack([rng.random((N,N)).astype(np.float32) for _ in range(3)])
a = jnp.asarray(a/a.sum(-1,keepdims=True))
xs = [jnp.asarray(rng.normal(size=(832,N,C)).astype(np.float32)) for _ in range(8)]
f = jax.jit(lambda x,a,w,b: gcn_apply({'w':w,'b':b}, x[None], [a[0],a[1],a[2]], order=2, mode='fused')[0])
jax.block_until_ready(f(xs[0],a,p['w'],p['b']))
t0=time.perf_counter()
n=80
for i in range(n): r=f(xs[i%8],a,p['w'],p['b'])
jax.block_until_ready(r)
us=(time.perf_counter()-t0)/n*1e6
flops=2*832*(3*2*207*207*32 + 7*207*32*32)
print(f"xla gcn fresh-inputs {us:.0f}us = {flops/us/1e6:.1f} TFLOPS", flush=True)
# concat mode
f2 = jax.jit(lambda x,a,w,b: gcn_apply({'w':w,'b':b}, x[None], [a[0],a[1],a[2]], order=2, mode='concat')[0])
jax.block_until_ready(f2(xs[0],a,p['w'],p['b']))
print(f"xla gcn concat {bench(f2, xs[0],a,p['w'],p['b']):.0f}us", flush=True)
