"""Multi-host runtime helpers.

The reference is single-process (SURVEY.md §2.8). For a multi-host TPU slice:

- every host runs the same program; :func:`initialize` brings up the
  ``jax.distributed`` coordination service;
- meshes from ``parallel.mesh`` span all global devices; each host feeds its
  process-local shard of the batch via :func:`global_batch`;
- ICI carries the collectives within a slice; across slices XLA routes over
  DCN (keep the ``data`` axis outermost so only gradient all-reduces cross
  DCN).

Single-process usage degrades cleanly: ``initialize`` is a no-op and
``global_batch`` is a plain device_put.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               auto: bool = False) -> dict:
    """Bring up the distributed runtime.

    The standard multi-host TPU pattern is ``jax.distributed.initialize()``
    with NO arguments — coordinator and process count auto-detected from the
    TPU metadata. Pass ``auto=True`` for that, or any explicit argument;
    with neither (and with an explicit ``num_processes=1``) this is the
    single-process no-op. Silently skipping auto-detection was a trap: each
    host would train independently with process_count=1 and no error."""
    explicit = any(v is not None for v in (coordinator_address,
                                           num_processes, process_id))
    if auto or (explicit and (num_processes is None or num_processes > 1)):
        kwargs = {k: v for k, v in dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id).items()
            if v is not None}
        jax.distributed.initialize(**kwargs)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def global_batch(local_batch: np.ndarray, sharding):
    """Assemble a globally-sharded array from this process's local shard.

    ``local_batch`` holds only this host's rows; the global batch dimension
    is ``process_count * local_rows``. With one process this is device_put.
    """
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)


def replicated_host_value(value, mesh):
    """Replicate a small host value (e.g. supports) across the global mesh.

    Multi-process: ``jax.device_put`` rejects shardings with
    non-addressable devices, so the replica is assembled with
    ``make_array_from_process_local_data`` — every process must hold the
    SAME full value (true for seeded host data and same-seed init)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(value, s)
    return jax.make_array_from_process_local_data(s, np.asarray(value))


def replicate_pytree(tree, mesh):
    """Replicate a pytree (e.g. a full TrainState) across a possibly
    multi-process global mesh. PRNG key arrays are round-tripped through
    ``key_data``/``wrap_key_data`` (extended dtypes cannot cross the
    host-assembly API directly)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.process_count() == 1:
        return jax.device_put(tree, NamedSharding(mesh, P()))

    def leaf(v):
        if hasattr(v, "dtype") and jnp.issubdtype(v.dtype,
                                                  jax.dtypes.prng_key):
            data = replicated_host_value(jax.random.key_data(v), mesh)
            return jax.random.wrap_key_data(data,
                                            impl=jax.random.key_impl(v))
        return replicated_host_value(v, mesh)

    return jax.tree_util.tree_map(leaf, tree)
