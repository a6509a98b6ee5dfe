"""Checkpointing: params + optimizer state + BN state + step + RNG.

The reference saves only ``model.state_dict()`` per epoch
(`/root/reference/train.py:206,295`) — no optimizer state, no mid-run resume
(SURVEY.md §5). Here a checkpoint is the FULL ``TrainState`` pytree
(flax msgpack serialization) plus a JSON sidecar with configs and the data
scaler, so training resumes exactly; best-k retention replaces keep-everything.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from dataclasses import asdict
from typing import Any

import jax
import numpy as np
from flax import serialization

from graph_wavenet_tpu.config import ModelConfig, TrainConfig, from_dict
from graph_wavenet_tpu.data.scaler import StandardScaler
from graph_wavenet_tpu.train.engine import TrainState


def _state_to_pytree(state) -> dict:
    if hasattr(state, "as_pytree"):     # already a host snapshot
        return state.as_pytree()
    return {
        "params": state.params,
        "opt_state": state.opt_state,
        "model_state": state.model_state,
        "step": state.step,
        "rng": jax.random.key_data(state.rng),
    }


def _fetch_pytree_host(tree):
    """Host snapshot of a device pytree with ONE transfer per dtype group.

    ``jax.device_get`` fetches leaf-by-leaf — one transport round trip per
    array, which dominates checkpoint latency through tunneled/remote device
    transports (~250 leaves in a TrainState = seconds of RTTs). Packing the
    leaves into a single flat device buffer per dtype makes it a handful of
    transfers regardless of pytree size; the packing concat is chunked to
    256 MB so the transient device copy stays bounded for large states.
    """
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    groups: dict = {}
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array):
            groups.setdefault(jnp.dtype(leaf.dtype), []).append(i)
    out = list(leaves)
    # cap the transient packed buffer so the device-side copy stays bounded
    # even for states sized near HBM capacity (the concat briefly holds a
    # second copy of the chunk)
    chunk_bytes = 256 * 1024 * 1024
    for dt, idxs in groups.items():
        chunk: list[int] = []
        size = 0

        def flush(chunk):
            flat = jnp.concatenate(
                [leaves[i].reshape(-1) for i in chunk]) if len(chunk) > 1                 else leaves[chunk[0]].reshape(-1)
            buf = np.asarray(flat)          # one fetch per chunk
            off = 0
            for i in chunk:
                n = int(np.prod(leaves[i].shape)) if leaves[i].shape else 1
                out[i] = buf[off:off + n].reshape(leaves[i].shape)
                off += n

        for i in idxs:
            nbytes = int(np.prod(leaves[i].shape) or 1) * dt.itemsize
            if chunk and size + nbytes > chunk_bytes:
                flush(chunk)
                chunk, size = [], 0
            chunk.append(i)
            size += nbytes
        if chunk:
            flush(chunk)
    return jax.tree_util.tree_unflatten(treedef, out)


def save_checkpoint(path: str, state: TrainState,
                    model_cfg: ModelConfig | None = None,
                    train_cfg: TrainConfig | None = None,
                    scaler: StandardScaler | None = None,
                    extra: dict | None = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pytree = _fetch_pytree_host(_state_to_pytree(state))
    # atomic publish (tmp + rename): a crash mid-write — including the
    # async writer thread dying at interpreter exit — must never leave a
    # truncated checkpoint at the final path, where a later resume would
    # fail with an opaque msgpack error instead of using an older epoch.
    # The JSON sidecar publishes FIRST: prune_checkpoints keys the pair on
    # the msgpack, so "msgpack exists" implies "pair complete" and a prune
    # racing this writer can never orphan a sidecar.
    meta: dict[str, Any] = {"format": "graph_wavenet_tpu/v1"}
    if model_cfg is not None:
        meta["model_cfg"] = asdict(model_cfg)
    if train_cfg is not None:
        meta["train_cfg"] = asdict(train_cfg)
    if scaler is not None:
        meta["scaler"] = {"mean": scaler.mean, "std": scaler.std}
    if extra:
        meta["extra"] = extra
    jtmp = path + ".json.tmp"
    with open(jtmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(jtmp, path + ".json")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(pytree))
    os.replace(tmp, path)


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of ``template`` (an initialized state)."""
    with open(path, "rb") as f:
        pytree = serialization.from_bytes(
            jax.device_get(_state_to_pytree(template)), f.read())
    return TrainState(
        params=pytree["params"],
        opt_state=pytree["opt_state"],
        model_state=pytree["model_state"],
        step=pytree["step"],
        # the key impl (threefry/rbg) is not stored in the key data; take it
        # from the template, which was built from the same TrainConfig
        rng=jax.random.wrap_key_data(
            np.asarray(pytree["rng"]),
            impl=str(jax.random.key_impl(template.rng))),
    )


def load_metadata(path: str) -> dict:
    with open(path + ".json") as f:
        meta = json.load(f)
    if "model_cfg" in meta:
        meta["model_cfg"] = from_dict(ModelConfig, meta["model_cfg"])
    if "train_cfg" in meta:
        meta["train_cfg"] = from_dict(TrainConfig, meta["train_cfg"])
    if "scaler" in meta:
        meta["scaler"] = StandardScaler(**meta["scaler"])
    return meta


class AsyncCheckpointer:
    """Non-blocking checkpoint writer.

    ``save()`` device_gets the state (cheap: the train loop needs the sync
    point anyway at epoch end) and hands serialization + disk IO to a single
    worker thread, so the next epoch's compute overlaps the write — the
    reference's ``torch.save`` per epoch is fully blocking
    (`/root/reference/train.py:295`). One in-flight write at a time
    (a second ``save`` while busy blocks until the previous completes, which
    bounds memory at 2 state copies). ``wait()`` drains the queue;
    exceptions from the worker re-raise on the next ``save``/``wait``.
    """

    def __init__(self):
        self._q: queue.Queue = queue.Queue(maxsize=1)
        self._err: list[BaseException] = []
        self._thread: threading.Thread | None = None

    def _worker(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            try:
                save_checkpoint(*item[0], **item[1])
            except BaseException as e:
                self._err.append(e)
            finally:
                self._q.task_done()

    def _check(self):
        if self._err:
            raise self._err.pop(0)

    def save(self, path: str, state: TrainState, **kwargs) -> None:
        self._check()
        if self._thread is None:
            self._thread = threading.Thread(target=self._worker,
                                            daemon=True,
                                            name="gwnet-ckpt-writer")
            self._thread.start()
        host_state = _fetch_pytree_host(_state_to_pytree(state))
        # re-wrap as a TrainState-shaped tuple for save_checkpoint
        self._q.put(((path, _HostState(host_state)), kwargs))

    def wait(self) -> None:
        self._q.join()
        self._check()


class _HostState:
    """Host-side snapshot that quacks like TrainState for serialization."""

    def __init__(self, pytree: dict):
        self._pytree = pytree

    def as_pytree(self) -> dict:
        return self._pytree


def prune_checkpoints(keep: int, scores: dict[str, float]) -> None:
    """Keep the ``keep`` best (lowest-score) checkpoints, delete the rest.
    ``scores``: checkpoint path -> validation loss; ``keep < 0`` keeps all
    (callers guard the TrainConfig keep-all sentinel themselves).

    Calling protocol (Runner._save_epoch): the writer enqueues/saves, the
    new path is added to ``scores``, then prune runs with the full ``keep``
    — and once more in ``_finalize_best`` after draining the async writer.
    The pair is keyed on the msgpack: ``save_checkpoint`` publishes the
    JSON sidecar first, so a path whose msgpack exists has a complete pair
    and can be deleted whole; a ranked-out path whose msgpack hasn't
    landed yet (write still queued or mid-publish) stays tracked for the
    next prune — deleting sidecar-only or popping early would orphan
    whichever file the racing writer publishes next."""
    if keep < 0:
        return
    ranked = sorted(scores.items(), key=lambda kv: kv[1])
    for path, _ in ranked[keep:]:
        if not os.path.exists(path):
            continue            # still queued; stays tracked
        if os.path.exists(path + ".json"):
            os.remove(path + ".json")
        os.remove(path)
        scores.pop(path, None)
