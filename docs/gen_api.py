"""Generate docs/API.md: a compact reference of the public package surface.

Walks every module under graph_wavenet_tpu, lists public classes/functions
with signatures and docstring summaries. Run from the repo root:

    JAX_PLATFORMS=cpu python docs/gen_api.py
"""

from __future__ import annotations

import importlib
import inspect
import os
import pkgutil
import sys


def summary(obj) -> str:
    doc = inspect.getdoc(obj) or ""
    first = doc.split("\n\n", 1)[0].replace("\n", " ").strip()
    return first


def signature(obj) -> str:
    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"
    # dataclass defaults expand to full reprs — collapse the FLAGSHIP
    # constant's exact repr only (any other ModelConfig default should be
    # shown, not mislabeled)
    from graph_wavenet_tpu.benchmarks import FLAGSHIP
    sig = sig.replace(repr(FLAGSHIP), "<FLAGSHIP>")
    if len(sig) > 400:
        sig = sig[:400] + " ...)"
    return sig


def walk(pkg_name: str):
    pkg = importlib.import_module(pkg_name)
    mods = [pkg_name]
    for m in pkgutil.walk_packages(pkg.__path__, prefix=pkg_name + "."):
        # skip the cli package AND its submodules (documented via --help)
        if "cli" in m.name.split(".") or m.name.endswith("__main__"):
            continue
        mods.append(m.name)
    return sorted(mods)


def main(out_path: str = "docs/API.md") -> None:
    lines = [
        "# API reference (generated)",
        "",
        "Public surface of `graph_wavenet_tpu`. Regenerate with "
        "`JAX_PLATFORMS=cpu python docs/gen_api.py`. CLI entry points are "
        "documented by their `--help` (see docs/MIGRATING.md).",
    ]
    for mod_name in walk("graph_wavenet_tpu"):
        try:
            mod = importlib.import_module(mod_name)
        except Exception as e:  # optional deps (torch, matplotlib)
            lines += ["", f"## {mod_name}", "", f"*(import skipped: {e})*"]
            continue
        entries = []
        for name, obj in sorted(vars(mod).items()):
            if name.startswith("_"):
                continue
            if getattr(obj, "__module__", None) != mod_name:
                continue  # re-exports documented at their home module
            if inspect.isclass(obj):
                entries.append(f"- **class `{name}`** — {summary(obj)}")
                for mname, meth in sorted(vars(obj).items()):
                    if mname.startswith("_"):
                        continue
                    if callable(meth) or isinstance(
                            meth, (classmethod, staticmethod, property)):
                        target = (meth.__func__ if isinstance(
                            meth, (classmethod, staticmethod)) else
                            meth.fget if isinstance(meth, property) else meth)
                        s = summary(target)
                        if s:
                            entries.append(f"  - `.{mname}` — {s}")
            elif inspect.isfunction(obj):
                entries.append(
                    f"- `{name}{signature(obj)}` — {summary(obj)}")
        if not entries:
            continue
        mod_doc = summary(mod)
        lines += ["", f"## {mod_name}", ""]
        if mod_doc:
            lines += [f"*{mod_doc}*", ""]
        lines += entries
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path} ({len(lines)} lines)")


if __name__ == "__main__":
    sys.path.insert(0, os.getcwd())
    main()
