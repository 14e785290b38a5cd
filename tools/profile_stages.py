"""Per-stage wall/CPU breakdown for one or more registered queries.

Guide §1 (measure first) + §7.1 (start with the UI): runs each named query
ONCE at the given SF with the Spark UI enabled, then reads the UI's REST API
(`/api/v1/applications/<id>/stages`) to print the stages that actually cost
time — executorRunTime, shuffle read/write bytes, input bytes, task count —
so optimization effort lands on the expensive exchange/scan, not a guess.

    python tools/profile_stages.py --sf sf0.1 matrix_profile_daily dbscan_grid_clusters

Timing action matches bench.py (`.count()`); pass --noop to time the
noop sink instead (guide §1.4: forces every column of every row).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="sf0.1")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    from ab_inbev_big_data_case_spark.registry import QUERIES, load_all
    from ab_inbev_big_data_case_spark.session import get_spark

    load_all()
    spark = get_spark(
        "profile", extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4055"}
    )
    sc = spark.sparkContext
    sf_dir = f"/root/testdata/{args.sf}"

    def rest(path: str):
        app_id = sc.applicationId
        url = f"http://localhost:4055/api/v1/applications/{app_id}{path}"
        with urllib.request.urlopen(url, timeout=10) as r:
            return json.load(r)

    for name in args.queries:
        fn = QUERIES[name]
        # warm: codegen + page cache, same discipline as bench.py
        fn(spark, "/root/testdata/sf0.001").count()
        seen = {s["stageId"] for s in rest("/stages")}
        sc.setJobDescription(f"profile:{name}")
        t0 = time.time()
        for _ in range(args.runs):
            df = fn(spark, sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
        wall = time.time() - t0
        sc.setJobDescription(None)
        stages = [s for s in rest("/stages") if s["stageId"] not in seen]
        stages.sort(key=lambda s: -s.get("executorRunTime", 0))
        tot_run = sum(s.get("executorRunTime", 0) for s in stages)
        # executorCpuTime is ns; runTime ms. run >> cpu per stage = task
        # threads blocked (GC pause, lock, fetch wait) — the 8c-vs-32c
        # pathology discriminator (VERDICT r15 item 1).
        tot_cpu = sum(s.get("executorCpuTime", 0) for s in stages) / 1e6
        print(f"\n=== {name}: wall {wall:.2f}s over {args.runs} run(s), "
              f"{len(stages)} stages, sum executorRunTime {tot_run/1000:.1f}s, "
              f"sum executorCpuTime {tot_cpu/1000:.1f}s ===")
        print(f"{'stage':>6} {'ms':>8} {'cpu_ms':>8} {'tasks':>5} {'input':>9} "
              f"{'shR':>9} {'shW':>9}  name")
        for s in stages[: args.top]:
            print(
                f"{s['stageId']:>6} {s.get('executorRunTime', 0):>8} "
                f"{int(s.get('executorCpuTime', 0) / 1e6):>8} "
                f"{s.get('numCompleteTasks', 0):>5} "
                f"{s.get('inputBytes', 0):>9} "
                f"{s.get('shuffleReadBytes', 0):>9} "
                f"{s.get('shuffleWriteBytes', 0):>9}  "
                f"{(s.get('description') or s.get('name', ''))[:70]}"
            )


if __name__ == "__main__":
    main()
