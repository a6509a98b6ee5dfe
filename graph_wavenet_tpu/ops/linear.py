"""Channel-wise dense ("1x1 conv") op and torch-parity initializers.

The reference's ``linear`` is a 1x1 ``nn.Conv2d`` (`/root/reference/
model.py:24-30`). On TPU, with channels-last activations ``(B, T, N, C)``, a
1x1 conv is exactly a matmul over the channel axis — one MXU contraction, no
conv machinery needed.

Initialization replicates torch's Conv2d reset (kaiming_uniform(a=sqrt(5)) for
weights, U(±1/sqrt(fan_in)) for bias — which both reduce to
U(±1/sqrt(fan_in))) so that training dynamics match the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def accum_dtype(x_dtype) -> jnp.dtype | None:
    """Accumulation dtype for matmuls: fp32 everywhere EXCEPT low-precision
    inputs on CPU — CPU XLA cannot execute BF16xBF16->F32 dots, so those
    accumulate in their own dtype there (tests use loose tolerances). TPU
    MXU and GPU tensor cores both accumulate fp32 natively for bf16."""
    if jnp.dtype(x_dtype) == jnp.float32:
        return jnp.float32
    return None if jax.default_backend() == "cpu" else jnp.float32


def conv_uniform_init(key, shape: tuple, fan_in: int,
                      dtype=jnp.float32) -> jnp.ndarray:
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch Conv2d default for both
    weight (kaiming_uniform with a=sqrt(5)) and bias."""
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_init(key, c_in: int, c_out: int, dtype=jnp.float32) -> dict:
    """Params for a channel-dense layer: w (c_in, c_out), b (c_out,)."""
    kw, kb = jax.random.split(key)
    return {
        "w": conv_uniform_init(kw, (c_in, c_out), c_in, dtype),
        "b": conv_uniform_init(kb, (c_out,), c_in, dtype),
    }


def linear_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """y[..., f] = sum_c x[..., c] w[c, f] + b[f].

    Mixed precision: weights are cast to the activation dtype (bf16 inputs
    hit the MXU at full rate) while the contraction accumulates in fp32.
    """
    out = jnp.einsum("...c,cf->...f", x, params["w"].astype(x.dtype),
                     preferred_element_type=accum_dtype(x.dtype))
    return (out + params["b"]).astype(x.dtype)
