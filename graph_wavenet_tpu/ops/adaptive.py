"""Learned adaptive adjacency.

``adp = softmax(relu(E1 @ E2), axis=row)`` over low-rank node embeddings
(`/root/reference/model.py:117-127,187` shared-graph; `model.py:324-352`
batched diff-G). Tiny compute — a (N, r) x (r, N) matmul — so plain XLA; it is
recomputed once per forward like the reference, not cached.

SVD init (`model.py:123-127`): top-r singular pairs of the init adjacency
scaled by sqrt(sigma). Runs on host numpy at model-build time — a one-shot
O(N^3) factorization does not belong on the TPU step path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from graph_wavenet_tpu.ops.linear import accum_dtype


def adaptive_adjacency(nodevec1: jnp.ndarray,
                       nodevec2: jnp.ndarray) -> jnp.ndarray:
    """softmax(relu(nv1 @ nv2), axis=1) for (N, r) x (r, N) -> (N, N).

    axis=1 matches the reference's ``dim=1`` (`model.py:187`): row v (node
    v's OUTGOING weights under ``nconv``'s out_w = sum_v x_v * A[v, w])
    is normalized over destination nodes w — each source row sums to 1;
    incoming weights per destination are unnormalized.
    """
    logits = jax.nn.relu(
        jnp.einsum("vr,rw->vw", nodevec1, nodevec2,
                   preferred_element_type=accum_dtype(nodevec1.dtype)))
    return jax.nn.softmax(logits, axis=1).astype(nodevec1.dtype)


def adaptive_adjacency_batched(nodevec1: jnp.ndarray,
                               nodevec2: jnp.ndarray) -> jnp.ndarray:
    """(B, N, r) x (B, r, N) -> (B, N, N), softmax over axis=2
    (`model.py:351-352`)."""
    logits = jax.nn.relu(
        jnp.einsum("bvr,brw->bvw", nodevec1, nodevec2,
                   preferred_element_type=accum_dtype(nodevec1.dtype)))
    return jax.nn.softmax(logits, axis=2).astype(nodevec1.dtype)


def random_nodevecs(key, num_nodes: int, rank: int = 10,
                    dtype=jnp.float32) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Standard-normal embeddings (`model.py:117-118`)."""
    k1, k2 = jax.random.split(key)
    return (jax.random.normal(k1, (num_nodes, rank), dtype),
            jax.random.normal(k2, (rank, num_nodes), dtype))


def svd_nodevecs(aptinit: np.ndarray, rank: int = 10,
                 dtype=np.float32) -> tuple[np.ndarray, np.ndarray]:
    """SVD init: E1 = U_r sqrt(S_r), E2 = sqrt(S_r) V_r^T
    (`model.py:123-127`). Host-side numpy."""
    m, p, nt = np.linalg.svd(np.asarray(aptinit, dtype=np.float64),
                             full_matrices=False)
    sqrt_p = np.sqrt(p[:rank])
    e1 = m[:, :rank] * sqrt_p[None, :]
    e2 = sqrt_p[:, None] * nt[:rank, :]
    return e1.astype(dtype), e2.astype(dtype)
