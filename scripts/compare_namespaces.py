#!/usr/bin/env python
"""Interactive diff of two argparse.Namespace reprs
(parity: reference scripts/compare_namespaces.py — paste two Namespace
reprs, get keys-only-in-each and value diffs; handy when comparing a
flag-built config against a checkpoint's embedded config echo).

Also usable non-interactively:
    python scripts/compare_namespaces.py ckpt_a.npz ckpt_b.npz
compares the `args` config echoes embedded in two checkpoints.
"""

import sys
from argparse import Namespace  # noqa: F401  (needed by eval'd input)


def keys(ns):
    return {k for k in dir(ns) if not k.startswith("_")}


def print_keys(ks, ns1, ns2=None):
    for k in sorted(ks):
        if ns2 is None:
            print(f"{k}\t{getattr(ns1, k, None)}")
        else:
            print(f"{k}\t{getattr(ns1, k, None)}\t{getattr(ns2, k, None)}")


def compare(ns1, ns2):
    k1, k2 = keys(ns1), keys(ns2)
    print("Keys only in namespace 1:")
    print_keys(k1 - k2, ns1)
    print()
    print("Keys only in namespace 2:")
    print_keys(k2 - k1, ns2)
    print()
    print("Overlapping keys with different values:")
    diff = {k for k in k1 & k2 if getattr(ns1, k) != getattr(ns2, k)}
    print_keys(diff, ns1, ns2)


def _ns_from_checkpoint(path):
    sys.path.insert(0, ".")
    from s2st_tpu.train.checkpoint import peek_meta
    return Namespace(**peek_meta(path).get("args", {}))


def main():
    if len(sys.argv) == 3:
        compare(_ns_from_checkpoint(sys.argv[1]),
                _ns_from_checkpoint(sys.argv[2]))
        return
    ns1 = eval(input("Namespace 1: "))  # noqa: S307 (reference parity)
    ns2 = eval(input("Namespace 2: "))
    compare(ns1, ns2)


if __name__ == "__main__":
    main()
