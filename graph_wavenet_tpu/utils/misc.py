"""Misc runtime utilities.

Parity surface: `/root/reference/Utils/miscTools.py` — filename mangling
(`num2filename`, `:16-28`), RNG state save/restore (`saveSeed`/`loadSeed`,
`:46-94`), and key=value experiment logging (`writeVarValues`, `:97-110`).
RNG checkpointing here covers numpy Generators and JAX PRNG keys (the torch
states of the reference have no meaning in this framework).
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import numpy as np


def num2filename(x, d: str = "_") -> str:
    """Render a number filename-safe: 0.1 -> '0_1', 2.0 -> '2'
    (reference `miscTools.py:16-28`)."""
    if x == int(x):
        return str(int(x))
    return str(x).replace(".", d)


def save_seed(save_dir: str, rng_states: list[dict[str, Any]],
              filename: str = "randomSeedUsed.pkl") -> None:
    """Pickle a list of RNG state dicts; numpy Generators and JAX key arrays
    are converted to picklable form."""
    os.makedirs(save_dir, exist_ok=True)
    serializable = []
    for st in rng_states:
        entry = dict(st)
        if isinstance(entry.get("state"), np.random.Generator):
            entry["state"] = entry["state"].bit_generator.state
            entry["kind"] = "numpy"
        elif entry.get("kind") == "jax":
            import jax
            # the key impl (threefry2x32/rbg/...) is not recoverable from
            # the key data; persist it or 'rbg' keys (the TrainConfig
            # default) fail to restore under the default impl
            entry["impl"] = str(jax.random.key_impl(entry["state"]))
            entry["state"] = np.asarray(jax.random.key_data(entry["state"]))
        serializable.append(entry)
    with open(os.path.join(save_dir, filename), "wb") as f:
        pickle.dump({"randomStates": serializable}, f)


def load_seed(load_dir: str,
              filename: str = "randomSeedUsed.pkl") -> list[dict[str, Any]]:
    """Restore RNG states saved by :func:`save_seed`; numpy entries come back
    as live Generators, jax entries as key arrays."""
    with open(os.path.join(load_dir, filename), "rb") as f:
        states = pickle.load(f)["randomStates"]
    out = []
    for entry in states:
        entry = dict(entry)
        if entry.get("kind") == "numpy":
            # rebuild the SAVED BitGenerator type — assigning an MT19937/
            # Philox state onto default_rng's PCG64 raises
            bg_name = entry["state"]["bit_generator"]
            gen = np.random.Generator(getattr(np.random, bg_name)())
            gen.bit_generator.state = entry["state"]
            entry["state"] = gen
        elif entry.get("kind") == "jax":
            import jax
            entry["state"] = jax.random.wrap_key_data(
                np.asarray(entry["state"]),
                impl=entry.pop("impl", None))
        out.append(entry)
    return out


def write_var_values(file_to_write: str, var_values: dict) -> None:
    """Append key = value lines (reference `miscTools.py:97-110`)."""
    with open(file_to_write, "a+") as f:
        for key, value in var_values.items():
            f.write(f"{key} = {value}\n")
        f.write("\n")


def enable_compilation_cache(cache_dir: str,
                             min_compile_time_secs: float = 1.0) -> str:
    """Turn on JAX's persistent XLA compilation cache rooted at
    ``cache_dir`` (created if missing) and return the absolute path.

    Production TPU jobs pay 20-40 s of XLA compilation per distinct
    (shape, config) executable on every process start; the persistent cache
    makes restarts, resumes (``--resume``) and serving redeploys of an
    already-seen configuration skip straight to execution. The reference has
    no equivalent (single research process, SURVEY.md §5). Compilations
    faster than ``min_compile_time_secs`` are not persisted (set 0.0 to
    cache everything, e.g. in tests).
    """
    import jax

    path = os.path.abspath(cache_dir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
