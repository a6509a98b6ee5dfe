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


# fp32-accumulator chunking threshold for the dilated conv (see the
# comment inside causal_conv_apply); module-level so tests can force the
# chunked branch at toy sizes
_CONV_ACCUM_CHUNK_BYTES = 2 ** 30


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

    def conv_rows(xs, rows):
        out = jnp.einsum("btnc,cf->btnf", xs[:, :rows], w[0],
                         preferred_element_type=accum_dtype(x.dtype))
        for i in range(1, k):
            out = out + jnp.einsum(
                "btnc,cf->btnf", xs[:, i * dilation:i * dilation + rows],
                w[i], preferred_element_type=accum_dtype(x.dtype))
        return (out + params["b"]).astype(x.dtype)

    # The fp32 accumulator materializes at (B, t_out, N, F) before the
    # cast; at long-K x wide-N scale it is the model's largest single
    # buffer (K=2912 x 40960 nodes x 2C=16 fp32 = 3.8 GiB) and multi-GiB
    # buffers are implicated in hard TPU compile-helper crashes at that
    # scale (r5, BENCH_NOTES "long-K x wide-N"). Chunk the OUTPUT time
    # axis so each fp32 accumulator stays <= _CONV_ACCUM_CHUNK_BYTES —
    # per-output-element math is unchanged (each chunk consumes its own
    # x slice + dilation halo), so outputs are bitwise identical
    # (pinned in tests/test_ops.py), and long-K peak memory drops too.
    f_out = w.shape[-1]
    acc_bytes = 4 * x.shape[0] * t_out * x.shape[2] * f_out
    if acc_bytes <= _CONV_ACCUM_CHUNK_BYTES or t_out < 2:
        return conv_rows(x, t_out)
    n_chunks = -(-acc_bytes // _CONV_ACCUM_CHUNK_BYTES)
    rows = -(-t_out // n_chunks)
    halo = dilation * (k - 1)
    pieces = []
    for a in range(0, t_out, rows):
        b = min(a + rows, t_out)
        pieces.append(conv_rows(x[:, a:b + halo], b - a))
    return jnp.concatenate(pieces, axis=1)


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
