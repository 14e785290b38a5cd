"""Pinned-arm worker for bench.py's interleaved A/B mode (VERDICT r10
item 3).

bench.py spawns this script with the PINNED worktree as argv[1]; the
worker imports the pinned tree's registry/session into its OWN process
(and its own Spark JVM), then serves a line-delimited JSON protocol on
stdin/stdout:

    {"cmd": "list"}                     -> {"queries": [...]}
    {"cmd": "warm", "name": q, "dir": d} -> {"name": q, "warmed": true}
    {"cmd": "time", "name": q, "dir": d} -> {"name": q, "sec": s}
    {"cmd": "quit"}                      -> (exits)

The parent strictly alternates: it never issues a request while timing
its own (HEAD) run, so exactly one query executes on the host at any
moment — the two arms share every drift source (load, thermal, page
cache) at per-run granularity instead of per-round.

This file lives at HEAD (the pinned tree predates it); only the pinned
tree's PACKAGE is imported, via sys.path. Anything that fails resolves
to an {"err": ...} line so the parent can fall back to single-arm.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    pin_dir = sys.argv[1]
    sys.path.insert(0, pin_dir)

    from ab_inbev_big_data_case_spark.registry import QUERIES, load_all
    from ab_inbev_big_data_case_spark.session import get_spark

    load_all()
    spark = get_spark("bench-pinned-arm")
    print(json.dumps({"ready": True}), flush=True)

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            cmd = req.get("cmd")
            if cmd == "quit":
                break
            if cmd == "list":
                print(json.dumps({"queries": sorted(QUERIES)}), flush=True)
                continue
            name, d = req["name"], req["dir"]
            if cmd == "warm":
                QUERIES[name](spark, d).count()
                print(json.dumps({"name": name, "warmed": True}), flush=True)
            elif cmd == "time":
                t0 = time.time()
                QUERIES[name](spark, d).count()
                print(
                    json.dumps({"name": name, "sec": time.time() - t0}),
                    flush=True,
                )
        except Exception as exc:  # noqa: BLE001 — protocol error channel
            print(json.dumps({"err": f"{type(exc).__name__}: {exc}"}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
