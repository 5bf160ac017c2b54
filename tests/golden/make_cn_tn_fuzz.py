#!/usr/bin/env python3
"""Regenerate tests/golden/cn_tn_fuzz.tsv: deterministic fuzz inputs run
through the REFERENCE normalizer's runtime
(examples/s2s_trans/preprocessing/cn_tn.py NSWNormalizer) to produce the
expected outputs our cn_text_norm must match.

Usage (needs the reference checkout):
    python tests/golden/make_cn_tn_fuzz.py \
        --reference /root/reference --n 500 \
        --output tests/golden/cn_tn_fuzz.tsv

The corpus is committed so the fuzz claim is reproducible without the
reference present; this script documents exactly how it was produced
(r2 verdict Weak #6)."""

import argparse
import importlib.util
import random
import sys


def gen_inputs(n: int, seed: int = 20260817):
    rng = random.Random(seed)
    han = "今天我们去公园看电影吃饭喝茶工作学习很好非常支持价格数量时间"
    latin = "abcdefgXYZ"
    punct = "，。！？、：；"

    def number():
        kind = rng.randrange(7)
        if kind == 0:
            return str(rng.randrange(0, 100000))
        if kind == 1:
            return f"{rng.randrange(0, 1000)}.{rng.randrange(0, 100):02d}"
        if kind == 2:
            return f"{rng.randrange(0, 101)}%"
        if kind == 3:
            return f"{rng.randrange(1990, 2030)}年{rng.randrange(1, 13)}月" \
                   f"{rng.randrange(1, 29)}日"
        if kind == 4:
            return f"{rng.randrange(1, 100)}/{rng.randrange(1, 1000)}"
        if kind == 5:
            return f"1{rng.choice('3589')}{rng.randrange(10 ** 8, 10 ** 9)}"
        return f"{rng.randrange(1, 100)}块{rng.randrange(0, 10)}"

    out = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randrange(1, 5)):
            r = rng.random()
            if r < 0.45:
                parts.append("".join(rng.choice(han)
                                     for _ in range(rng.randrange(1, 6))))
            elif r < 0.8:
                parts.append(number())
            elif r < 0.9:
                parts.append("".join(rng.choice(latin)
                                     for _ in range(rng.randrange(1, 4))))
            else:
                parts.append(rng.choice(punct))
        out.append("".join(parts))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--n", type=int, default=500)
    ap.add_argument("--seed", type=int, default=20260817)
    ap.add_argument("--output", default="tests/golden/cn_tn_fuzz.tsv")
    args = ap.parse_args()

    path = f"{args.reference}/examples/s2s_trans/preprocessing/cn_tn.py"
    spec = importlib.util.spec_from_file_location("ref_cn_tn", path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    rows = []
    for raw in gen_inputs(args.n, args.seed):
        try:
            expected = ref.NSWNormalizer(raw).normalize()
        except Exception as e:  # reference crashes on some inputs; skip
            print(f"skip {raw!r}: {e}", file=sys.stderr)
            continue
        if "\t" in raw or "\t" in expected:
            continue
        rows.append((raw, expected))

    with open(args.output, "w", encoding="utf-8") as f:
        for raw, expected in rows:
            f.write(f"{raw}\t{expected}\n")
    print(f"wrote {len(rows)} cases to {args.output}")


if __name__ == "__main__":
    main()
