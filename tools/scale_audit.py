"""Scale-curve audit: wall-clock ratios across scale factors for any set
of registered queries.

Formalizes the SCALE.md methodology used since round 5 (previously ad-hoc
scripts): median-of-N timing, warm codegen (one sf0.001 run first), and a
ratio column against the base SF. A ratio well above the data growth
factor is the quadratic/skew tripwire; at-or-below means bounded-spine /
panel shapes are holding.

Usage:
    python tools/scale_audit.py q1 q2 ...            # sf0.1 -> .scale/sf1
    python tools/scale_audit.py --base /root/testdata/sf0.01 \
        --target /root/testdata/sf0.1 --runs 5 q1 q2

The sf1 dataset is benchmark-only (tools/make_scale_data.py); correctness
stays on the driver fixtures.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--target",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale",
            "sf1",
        ),
    )
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from ab_inbev_big_data_case_spark.registry import QUERIES, load_all
    from ab_inbev_big_data_case_spark.session import get_spark

    load_all()
    unknown = [n for n in args.names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"not registered: {unknown}")
    spark = get_spark("scale_audit")

    def med(fn, d: str) -> float:
        samples = []
        for _ in range(args.runs):
            t0 = time.time()
            fn(spark, d).count()
            samples.append(time.time() - t0)
        return round(sorted(samples)[len(samples) // 2], 2)

    print(f"| query | {os.path.basename(args.base)} | "
          f"{os.path.basename(args.target)} | ratio |")
    print("|---|---|---|---|")
    for n in args.names:
        fn = QUERIES[n]
        fn(spark, "/root/testdata/sf0.001").count()  # warm codegen
        a = med(fn, args.base)
        b = med(fn, args.target)
        print(f"| {n} | {a} | {b} | {round(b / a, 1)}× |", flush=True)


if __name__ == "__main__":
    main()
