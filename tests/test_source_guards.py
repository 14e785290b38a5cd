"""Static source guards for the package's distributed-execution contract
(the properties every VERDICT audits by hand — pinned here so a regression
fails in CI, not in review):

1. ``.collect()`` only at the audited dimension-bounded sites — a new
   collect in a data path is a driver-side loop, the #1 anti-pattern the
   build bans.
2. No row-at-a-time Python UDFs (``F.udf`` / ``@udf``): every Python
   escape hatch must be Arrow-batched (pandas_udf / mapInPandas /
   applyInPandas).
3. No ``.toPandas()`` anywhere in the package (driver materialization).
4. RDD access only at the audited partition-count probe.
"""

from __future__ import annotations

import os
import re

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ab_inbev_big_data_case_spark",
)

#: file -> allowed occurrence count, each site audited (see the files'
#: own comments for the boundedness argument).
COLLECT_ALLOWED = {
    # per-micro-batch monitor fold over the day-spine-bounded batch
    "streaming/jobs.py": 1,
    # dim²-bounded Gram-matrix pull for the PQ codebook, plus the
    # K-bounded (K = O(√N)) centroid pull feeding ivf_assign's broadcast,
    # plus the Q-bounded query-side pull feeding cosine_pairs' broadcast
    # (it was already the broadcast side of the crossJoin)
    "llm/similarity.py": 3,
    # touched-partition list (partition-count-bounded) for targeted overwrite
    "sources/writers.py": 1,
}

RDD_ALLOWED = {
    # getNumPartitions probe (metadata only, no data movement) + its
    # docstring mention (the simple comment-stripper doesn't see
    # docstrings)
    "operators/partitioning.py": 2,
}


def _py_files():
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if f.endswith(".py"):
                yield os.path.join(root, f)


def _count_code_occurrences(path: str, pattern: str) -> int:
    n = 0
    for line in open(path, encoding="utf-8"):
        stripped = line.split("#", 1)[0]
        n += len(re.findall(pattern, stripped))
    return n


def _rel(path: str) -> str:
    return os.path.relpath(path, PKG).replace(os.sep, "/")


def test_collect_only_at_audited_sites():
    offenders = {}
    for path in _py_files():
        n = _count_code_occurrences(path, r"\.collect\(\)")
        allowed = COLLECT_ALLOWED.get(_rel(path), 0)
        if n != allowed and (n > allowed or allowed > 0):
            offenders[_rel(path)] = f"{n} collect() sites (allowed {allowed})"
    assert offenders == {}, offenders


def test_no_row_at_a_time_python_udfs():
    offenders = {}
    for path in _py_files():
        # F.udf( / @udf — but NOT pandas_udf (Arrow-batched, allowed)
        n = _count_code_occurrences(path, r"(?<!pandas_)\budf\(")
        if n:
            offenders[_rel(path)] = n
    assert offenders == {}, offenders


def test_no_topandas_in_package():
    offenders = [
        _rel(p) for p in _py_files() if _count_code_occurrences(p, r"\.toPandas\(\)")
    ]
    assert offenders == []


def test_rdd_access_only_at_audited_probe():
    offenders = {}
    for path in _py_files():
        n = _count_code_occurrences(path, r"\.rdd\b")
        allowed = RDD_ALLOWED.get(_rel(path), 0)
        if n > allowed:
            offenders[_rel(path)] = f"{n} .rdd sites (allowed {allowed})"
    assert offenders == {}, offenders
