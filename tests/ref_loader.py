"""Load the reference fairseq fork (/root/reference) inside this test
process so parity tests can run its *actual* torch model/criterion code
against the TPU-native framework on identical batches.

Hurdles handled here:
  * omegaconf / hydra are not installed → minimal stubs in tests/ref_stubs
  * the fork was written for Python<=3.10 dataclasses, which allowed a
    (unfrozen) dataclass instance as a field default; 3.11+ rejects any
    default whose class has __hash__ None. We wrap the `dataclass`
    decorator during the reference import so decorated classes keep
    object.__hash__, which makes the containing-class field check pass
    without changing semantics the reference relies on (it never hashes
    its config objects).

Usage:
    ref = load_reference()        # module namespace, cached
    ref.s2st_transformer ...      # examples/s2s_trans model module
"""

import contextlib
import dataclasses
import functools
import os
import sys
import types

_REF_ROOT = "/root/reference"
_STUBS = os.path.join(os.path.dirname(__file__), "ref_stubs")

_cache = None


@contextlib.contextmanager
def _hashable_dataclasses():
    orig = dataclasses.dataclass

    @functools.wraps(orig)
    def patched(cls=None, /, **kw):
        def wrap(c):
            out = orig(c, **kw)
            if out.__hash__ is None:
                out.__hash__ = object.__hash__
            return out

        return wrap if cls is None else wrap(cls)

    dataclasses.dataclass = patched
    try:
        yield
    finally:
        dataclasses.dataclass = orig


def reference_available():
    return os.path.isdir(_REF_ROOT) and os.path.isdir(_STUBS)


def load_reference():
    """Import the reference fairseq + the s2s_trans extension; return a
    namespace with the modules the parity tests need. Cached."""
    global _cache
    if _cache is not None:
        return _cache

    # Append (not prepend): /root/reference also contains a top-level
    # tests/ directory that must never shadow this repo's tests package.
    for p in (_STUBS, _REF_ROOT):
        if p not in sys.path:
            sys.path.append(p)

    # The fork predates numpy 1.24's removal of the builtin aliases.
    import numpy as np

    for alias, typ in (("float", float), ("int", int), ("bool", bool), ("object", object), ("str", str)):
        if not hasattr(np, alias):
            setattr(np, alias, typ)

    # torch 2.x removed torch._C.has_cudnn (the fork only feature-gates on it).
    import torch

    if not hasattr(torch._C, "has_cudnn"):
        torch._C.has_cudnn = torch.backends.cudnn.is_available()

    with _hashable_dataclasses():
        import fairseq  # noqa: F401
        import fairseq.utils
        import fairseq.tasks
        import fairseq.models
        import fairseq.criterions
        from fairseq.data import Dictionary as RefDictionary

        # Load examples/s2s_trans as a --user-dir plugin, exactly as the
        # reference's CLIs do (fairseq/utils.py:462-507).
        import argparse

        ns = argparse.Namespace(user_dir=os.path.join(_REF_ROOT, "examples", "s2s_trans"))
        fairseq.utils.import_user_module(ns)

        # import_user_module already imported the extension's submodules
        # (registering tasks/models/criterions); fetch them from
        # sys.modules under whatever package name it used rather than
        # re-importing (a second exec would hit duplicate-registration
        # guards in fairseq.registry).
        def _find(suffix):
            for name, mod in sys.modules.items():
                if (
                    name.endswith(suffix)
                    and mod is not None
                    and not name.startswith("s2st_tpu")
                    and "/reference/" in (getattr(mod, "__file__", "") or "")
                ):
                    return mod
            raise ImportError(f"reference module *{suffix} not loaded")

        mods = types.SimpleNamespace(
            fairseq=fairseq,
            Dictionary=RefDictionary,
            s2st_transformer=_find("models.s2st_transformer"),
            s2st_loss=_find("criterions.s2st_loss"),
            s2st_transformer_mtl=_find("models.s2st_transformer_mtl"),
            s2st_loss_mtl=_find("criterions.s2st_loss_mtl"),
            tasks=fairseq.tasks,
            models=fairseq.models,
        )

    _cache = mods
    return mods
