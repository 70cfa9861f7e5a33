"""Generate the markdown API reference under docs/api/ from docstrings.

The reference ships a Sphinx tree (/root/reference/docs/source) that
autodocs its NumPy-style docstrings. This environment has no sphinx, so
the equivalent here is a stdlib generator: it imports every module of
``baryonification_tpu``, walks the public surface with ``inspect``, and
emits one markdown file per module (signature + docstring for every
public class, method, and function) plus an index.

Regenerate after API changes with:

    JAX_PLATFORMS=cpu python docs/gen_api.py

The generated files are checked in so the API reference is browsable
without running anything.
"""
import importlib
import inspect
import os
import pkgutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax                                              # noqa: E402
jax.config.update("jax_platforms", "cpu")

PKG = "baryonification_tpu"
OUT = os.path.join(ROOT, "docs", "api")


def _modules():
    pkg = importlib.import_module(PKG)
    names = [PKG]
    for info in pkgutil.walk_packages(pkg.__path__, prefix=PKG + "."):
        base = info.name.rsplit(".", 1)[-1]
        if base.startswith("_"):
            continue
        names.append(info.name)
    return sorted(names)


def _doc(obj):
    d = inspect.getdoc(obj)
    if d and d.startswith("Initialize self."):   # object.__init__ default
        return ""
    return d.strip() if d else ""


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _public_members(mod):
    """Classes/functions DEFINED in this module (re-exports skipped —
    they are documented where they are defined)."""
    out = []
    for name, obj in vars(mod).items():
        if name.startswith("_"):
            continue
        if not (inspect.isclass(obj) or inspect.isfunction(obj)):
            continue
        if getattr(obj, "__module__", None) != mod.__name__:
            continue
        out.append((name, obj))
    out.sort(key=lambda kv: kv[1].__code__.co_firstlineno
             if inspect.isfunction(kv[1]) else
             (inspect.getsourcelines(kv[1])[1]
              if _has_source(kv[1]) else 0))
    return out


def _has_source(obj):
    try:
        inspect.getsourcelines(obj)
        return True
    except (OSError, TypeError):
        return False


def _render_function(name, fn, level):
    lines = [f"{'#' * level} `{name}{_sig(fn)}`", ""]
    doc = _doc(fn)
    if doc:
        lines += [doc, ""]
    return lines


def _render_class(name, cls):
    lines = [f"## `{name}{_sig(cls)}`", ""]
    bases = [b.__name__ for b in cls.__bases__ if b is not object]
    if bases:
        lines += [f"*Bases:* {', '.join('`%s`' % b for b in bases)}", ""]
    doc = _doc(cls)
    if doc:
        lines += [doc, ""]
    for mname, member in sorted(vars(cls).items()):
        if mname.startswith("_") and mname != "__init__":
            continue
        raw = member
        if isinstance(raw, (staticmethod, classmethod)):
            raw = raw.__func__
        if isinstance(raw, property):
            pd = _doc(raw)
            lines += [f"### `{name}.{mname}` *(property)*", ""]
            if pd:
                lines += [pd, ""]
            continue
        if not inspect.isfunction(raw):
            continue
        # skip undocumented trivial dunders; keep documented __init__
        if mname == "__init__" and not _doc(raw):
            continue
        lines += _render_function(f"{name}.{mname}", raw, 3)
    return lines


def _render_module(modname):
    mod = importlib.import_module(modname)
    lines = [f"# `{modname}`", ""]
    doc = _doc(mod)
    if doc:
        lines += [doc, ""]
    members = _public_members(mod)
    for name, obj in members:
        if inspect.isclass(obj):
            lines += _render_class(name, obj)
        else:
            lines += _render_function(name, obj, 2)
    return "\n".join(lines).rstrip() + "\n", len(members)


def main():
    os.makedirs(OUT, exist_ok=True)
    index = ["# API reference", "",
             "Generated from docstrings by `docs/gen_api.py` "
             "(regenerate: `JAX_PLATFORMS=cpu python docs/gen_api.py`).",
             ""]
    for modname in _modules():
        text, n = _render_module(modname)
        fname = modname.replace(".", "_") + ".md"
        with open(os.path.join(OUT, fname), "w") as f:
            f.write(text)
        mod = importlib.import_module(modname)
        first = (_doc(mod).splitlines() or [""])[0]
        index.append(f"- [`{modname}`](api/{fname}) — {first}")
        print(f"{fname}: {n} members")
    with open(os.path.join(ROOT, "docs", "API.md"), "w") as f:
        f.write("\n".join(index) + "\n")


if __name__ == "__main__":
    main()
