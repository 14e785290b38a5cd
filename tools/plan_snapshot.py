"""Snapshot per-query `.explain("formatted")` into plans/<tag>/<query>_<when>.txt.

Optimization-round evidence (guide §1): commit the BEFORE plan, make the
change, commit the AFTER plan, so a reviewer can diff Exchange counts, join
strategies, PushedFilters, and Python-eval nodes without running Spark.

    python tools/plan_snapshot.py --tag r15 --when before q1 q2 ...
    python tools/plan_snapshot.py --tag r15 --when before --all-headline
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--tag", default="r15")
    ap.add_argument("--when", choices=("before", "after"), required=True)
    ap.add_argument("--all-headline", action="store_true")
    ap.add_argument("--sf", default="sf0.1")
    args = ap.parse_args()

    from bench import HEADLINE
    from ab_inbev_big_data_case_spark.registry import QUERIES, load_all
    from ab_inbev_big_data_case_spark.session import get_spark

    load_all()
    names = list(args.queries)
    if args.all_headline:
        names += [n for n in HEADLINE if n not in names]
    spark = get_spark("plan_snapshot")
    outdir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(outdir, exist_ok=True)
    sf_dir = f"/root/testdata/{args.sf}"
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{args.when}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
