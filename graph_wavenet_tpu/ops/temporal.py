"""Gated dilated causal temporal convolution.

The reference computes ``tanh(filter_conv(x)) * sigmoid(gate_conv(x))`` with
two (1, kernel_size)-dilated convolutions per layer
(`/root/reference/model.py:135-141,208-212`). TPU-native design: with
channels-last ``(B, T, N, C)`` activations a (1, k) dilated *valid* conv over
time is exactly k shifted channel-matmuls — we express it that way so XLA maps
every tap onto the MXU and fuses the tanh/sigmoid gate epilogue, instead of
going through general conv lowering. (A fused Pallas kernel for the whole
gated unit was tried in round 1 and removed: it lost to XLA at every
flagship shape — postmortem in BENCH_NOTES.md "Pallas kernel status".)

Weight layout: ``w[k, c_in, c_out]`` — tap-major; tap ``k`` multiplies
``x[:, t + k*dilation]`` (cross-correlation, torch convention), so
``w[k] == torch_weight[:, :, 0, k].T``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graph_wavenet_tpu.ops.linear import accum_dtype, conv_uniform_init


def causal_conv_init(key, c_in: int, c_out: int, kernel_size: int,
                     dtype=jnp.float32) -> dict:
    """Torch-parity init: fan_in = c_in * kernel_size."""
    kw, kb = jax.random.split(key)
    fan_in = c_in * kernel_size
    return {
        "w": conv_uniform_init(kw, (kernel_size, c_in, c_out), fan_in, dtype),
        "b": conv_uniform_init(kb, (c_out,), fan_in, dtype),
    }


def causal_conv_apply(params: dict, x: jnp.ndarray,
                      dilation: int) -> jnp.ndarray:
    """Valid dilated causal conv over the time axis of ``(B, T, N, C)``.

    Output time length is ``T - dilation * (k - 1)``; output step ``t``
    depends on inputs ``t, t+d, ..., t+(k-1)d`` — i.e. the *last* output step
    sees the last input step, matching torch's valid conv with the output
    right-aligned to the input.
    """
    w = params["w"].astype(x.dtype)
    k = w.shape[0]
    t_out = x.shape[1] - dilation * (k - 1)
    out = jnp.einsum("btnc,cf->btnf", x[:, :t_out], w[0],
                     preferred_element_type=accum_dtype(x.dtype))
    for i in range(1, k):
        out = out + jnp.einsum(
            "btnc,cf->btnf", x[:, i * dilation:i * dilation + t_out], w[i],
            preferred_element_type=accum_dtype(x.dtype))
    return (out + params["b"]).astype(x.dtype)


def pack_gated_conv_params(filter_params: dict, gate_params: dict) -> dict:
    """Concat separate filter/gate conv params into ONE double-width conv
    (w (k, C, 2F), b (2F,)) — filter channels first, gate second: the
    taps' x slices are read once instead of twice and the channel matmul
    doubles in width."""
    return {
        "w": jnp.concatenate([filter_params["w"], gate_params["w"]],
                             axis=-1),
        "b": jnp.concatenate([filter_params["b"], gate_params["b"]]),
    }


def gated_tcn_apply(filter_params: dict, gate_params: dict, x: jnp.ndarray,
                    dilation: int) -> jnp.ndarray:
    """tanh(filter) * sigmoid(gate) gated activation unit
    (`/root/reference/model.py:208-212`).

    The two convs are packed into ONE double-width conv (w (k, C, 2F)):
    the taps' x slices are read once instead of twice and the channel
    matmul doubles in width (better MXU lane occupancy at F=32). The
    output blocks are bitwise-identical to two separate convs — the
    contraction per output channel is unchanged.
    """
    f = filter_params["w"].shape[-1]
    fg = causal_conv_apply(pack_gated_conv_params(filter_params,
                                                  gate_params), x, dilation)
    return jnp.tanh(fg[..., :f]) * jax.nn.sigmoid(fg[..., f:])


def left_pad_time(x: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Zero-pad the time axis on the left up to ``target_len`` — the
    receptive-field pad of `/root/reference/model.py:176-180` and the engine's
    extra 1-step pad (`engine.py:44`)."""
    t = x.shape[1]
    if t >= target_len:
        return x
    pad = [(0, 0)] * x.ndim
    pad[1] = (target_len - t, 0)
    return jnp.pad(x, pad)
