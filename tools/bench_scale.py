"""Wall-clock scale curves for the most expensive headliners across
sf0.001 → sf1 (sf1 from tools/make_scale_data.py — benchmark-only 10×
replica with matched distributions).

Each query is warmed once at sf0.001, then timed (median of N runs) at
every available scale factor. The printed markdown table goes into
SCALE.md; the thing to read off each row is the growth exponent between
adjacent 10× steps: t(10x)/t(x) ≈ 10 is linear scan-bound, « 10 means
fixed-cost dominated, » 10 means a superlinear shape that would not
survive the next 10×.

    python tools/bench_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIVE = [
    "curation_pipeline_e2e",
    "bloom_join_prefilter",
    "sparse_cosine_topk",
    "semdedup_corpus",
    "simhash_hamming_pairs",
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = [
    ("0.001", "/root/testdata/sf0.001"),
    ("0.01", "/root/testdata/sf0.01"),
    ("0.1", "/root/testdata/sf0.1"),
    ("1", os.path.join(REPO, ".scale", "sf1")),
]


def main() -> None:
    from ab_inbev_big_data_case_spark.registry import QUERIES, load_all
    from ab_inbev_big_data_case_spark.session import get_spark

    load_all()
    global FIVE
    if len(sys.argv) > 1 and sys.argv[1] == "--all":
        from bench import HEADLINE

        FIVE = list(HEADLINE)
    elif len(sys.argv) > 1:
        FIVE = sys.argv[1:]
    spark = get_spark("bench_scale")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    for name in FIVE:
        QUERIES[name](spark, SFS[0][1]).count()  # warm codegen/worker pool

    rows = {name: [] for name in FIVE}
    for sf, sf_dir in SFS:
        if not os.path.isdir(sf_dir):
            print(f"skip sf{sf}: {sf_dir} missing (run make_scale_data.py)",
                  file=sys.stderr)
            for name in FIVE:
                rows[name].append(None)
            continue
        for name in FIVE:
            samples = []
            for _ in range(n_runs):
                t0 = time.time()
                QUERIES[name](spark, sf_dir).count()
                samples.append(time.time() - t0)
            rows[name].append(sorted(samples)[len(samples) // 2])
            print(f"sf{sf} {name}: {rows[name][-1]:.2f}s", file=sys.stderr)

    print("| query | " + " | ".join(f"sf{sf}" for sf, _ in SFS)
          + " | 0.1→1 ratio |")
    print("|---|" + "---|" * (len(SFS) + 1))
    for name in FIVE:
        r = rows[name]
        ratio = (f"{r[-1] / r[-2]:.1f}×"
                 if r[-1] is not None and r[-2] else "—")
        cells = " | ".join(f"{t:.2f}" if t is not None else "—" for t in r)
        print(f"| {name} | {cells} | {ratio} |")


if __name__ == "__main__":
    main()
