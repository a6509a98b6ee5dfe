"""Host-side in-memory batchers.

Parity with the reference ``DataLoader`` / ``DataLoader_syn``
(`/root/reference/Utils/util.py:14-102`): the tail is padded with copies of
the last sample so the sample count divides the batch size, ``shuffle()``
permutes in place, iteration yields numpy slices. A seeded numpy Generator
replaces the global numpy RNG.

The known bias of pad-with-last (quirk #6, SURVEY.md §7.4 — padded duplicates
skew val/test averages) is kept for parity but exposed: ``num_real`` records
the unpadded count, and sharded iteration (``sharded_iterator``) builds global
jax Arrays for a device mesh from the same batches.
"""

from __future__ import annotations

import numpy as np


def pad_with_last(arr: np.ndarray, batch_size: int) -> np.ndarray:
    """Pad the leading axis with copies of the last entry so
    ``len % batch_size == 0`` (`/root/reference/Utils/util.py:25-30`) — THE
    padding convention, shared by every batcher so parity fixes land once."""
    pad = (-len(arr)) % batch_size
    if pad:
        arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)],
                             axis=0)
    return arr


class DataLoader:
    """Batcher over (xs, ys[, adj_idx]) arrays.

    Passing ``adj_idx`` makes it the per-sample-graph variant (3-tuples per
    batch, reference ``DataLoader_syn``).
    """

    def __init__(self, xs: np.ndarray, ys: np.ndarray, batch_size: int,
                 adj_idx: np.ndarray | None = None,
                 pad_with_last_sample: bool = True,
                 rng: np.random.Generator | None = None):
        self.batch_size = batch_size
        self.num_real = len(xs)
        self.rng = rng if rng is not None else np.random.default_rng()
        if pad_with_last_sample:
            xs = pad_with_last(xs, batch_size)
            ys = pad_with_last(ys, batch_size)
            if adj_idx is not None:
                adj_idx = pad_with_last(adj_idx, batch_size)
        self.size = len(xs)
        self.num_batch = self.size // batch_size
        self.xs = xs
        self.ys = ys
        self.adj_idx = adj_idx

    def shuffle(self):
        perm = self.rng.permutation(self.size)
        self.xs = self.xs[perm]
        self.ys = self.ys[perm]
        if self.adj_idx is not None:
            self.adj_idx = self.adj_idx[perm]

    def get_iterator(self):
        for i in range(self.num_batch):
            lo, hi = i * self.batch_size, (i + 1) * self.batch_size
            if self.adj_idx is None:
                yield self.xs[lo:hi], self.ys[lo:hi]
            else:
                yield self.xs[lo:hi], self.ys[lo:hi], self.adj_idx[lo:hi]

    def __len__(self):
        return self.num_batch


# alias mirroring the reference's class split
DataLoaderSyn = DataLoader


def loader_cls(resident: str):
    """Select the batcher for a residency mode: "host" = numpy batches
    copied per step, "device" = dataset in HBM with on-device gathers
    (``data.device_loader``, ~7.5x faster epochs through slow transports —
    BENCH_NOTES.md)."""
    if resident == "device":
        from graph_wavenet_tpu.data.device_loader import DeviceArrayLoader
        return DeviceArrayLoader
    if resident != "host":
        raise ValueError(
            f"resident must be 'host' or 'device', got {resident!r}")
    return DataLoader


def resident_sharding_kw(resident: str, sharding) -> dict:
    """Constructor kwargs forwarding a batch ``NamedSharding`` to the
    device-resident loaders (mesh-replicated data + sharded gathers —
    the multi-chip fast feed). Host loaders take no sharding: batches
    are laid out by the Runner/GSPMD instead, so a sharding with
    ``resident="host"`` is a caller error worth naming."""
    if sharding is None:
        return {}
    if resident != "device":
        raise ValueError(
            "a batch sharding only applies to resident='device' loaders "
            f"(got resident={resident!r}); host batches are laid out by "
            "the Runner")
    return {"sharding": sharding}


def sharded_iterator(loader: DataLoader, sharding):
    """Wrap batches as global device arrays laid out per ``sharding`` (a
    ``jax.sharding.NamedSharding`` over the batch axis) — the multi-host
    feed path; single-device shardings degrade to plain device_put.

    Lower-rank batch elements (the per-sample-graph 3-tuple's ``adj_idx``
    is (B,)) take the leading prefix of the PartitionSpec, so a 4-D
    ``P(data, time, model, None)`` batch sharding lays ``adj_idx`` out as
    ``P(data)`` instead of crashing on the rank mismatch."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    def place(b, s):
        spec = getattr(s, "spec", None)
        if spec is not None and getattr(b, "ndim", None) is not None \
                and b.ndim < len(spec):
            s = NamedSharding(s.mesh, PartitionSpec(*spec[:b.ndim]))
        return jax.device_put(b, s)

    for batch in loader.get_iterator():
        yield tuple(place(b, sharding) for b in batch)
