import time
import numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
m = 4096
A = jnp.asarray((rng.normal(size=(m,m))/ m**0.5).astype(np.float32))
f = jax.jit(lambda x, a: x@a)
x = jax.block_until_ready(f(A, A))
for n in (2, 5, 10, 20, 40):
    x = A
    t0=time.perf_counter()
    for _ in range(n): x = f(x, A)
    s = float(x.sum())   # force full fetch
    dt = time.perf_counter()-t0
    print(f"n={n}: total {dt*1e3:.1f}ms per-iter {dt/n*1e6:.0f}us (sum={s:.3e})", flush=True)
# also: single fori_loop on device
g = jax.jit(lambda x, a: jax.lax.fori_loop(0, 40, lambda i, v: v@a, x))
jax.block_until_ready(g(A, A))
t0=time.perf_counter(); r = g(A, A); jax.block_until_ready(r)
print(f"fori 40 matmuls: {(time.perf_counter()-t0)/40*1e6:.0f}us/matmul", flush=True)
