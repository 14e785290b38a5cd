"""Property-based tests (hypothesis) for the delta-lite transaction log:
arbitrary interleavings of APPEND / MERGE / DELETE must leave the table
equal to a trivial dict-replay model — the executable specification of the
upsert semantics. Each example runs real Spark jobs, so examples are few
and rows small; the value is the INTERLEAVING coverage no hand-written
case list reaches."""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from ab_inbev_big_data_case_spark.sources.txlog import DeltaLiteTable

KEYS = st.integers(min_value=0, max_value=6)
VALS = st.integers(min_value=-5, max_value=5)

# an op is ('append'|'merge', [(key, val)...]) or ('delete', key)
OPS = st.lists(
    st.one_of(
        st.tuples(
            st.sampled_from(["append", "merge"]),
            st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=3),
        ),
        st.tuples(st.just("delete"), KEYS),
    ),
    min_size=1,
    max_size=5,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, float(v)) for k, v in rows], "id INT, val DOUBLE"
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=OPS)
def test_log_replay_equals_dict_model(spark, tmp_path_factory, ops):
    """After any op sequence: snapshot() == the dict model; every
    intermediate version remains time-travelable and equals the model's
    state at that step."""
    path = str(tmp_path_factory.mktemp("prop") / "t")
    t = DeltaLiteTable.create(spark, _df(spark, [(0, 0)]), path, keys=["id"])
    model: dict[int, float] = {0: 0.0}
    states = [dict(model)]
    for op in ops:
        if op[0] == "append":
            # appends may duplicate keys: the model keeps ALL rows keyed by
            # multiset; to keep the model a dict, route appends through
            # merge semantics when the key exists (dedup-first), else add
            rows = op[1]
            # deduplicate within the batch (last wins, like merge's input)
            batch = {k: float(v) for k, v in rows}
            new_only = {k: v for k, v in batch.items() if k not in model}
            if not new_only:
                continue  # no commit -> no new version, no state entry
            t.write(_df(spark, list(new_only.items())), mode="append")
            model.update(new_only)
        elif op[0] == "merge":
            rows = op[1]
            batch = {k: float(v) for k, v in rows}
            t.merge(_df(spark, list(batch.items())))
            model.update(batch)
        else:
            k = op[1]
            t.delete_where(f"id = {k}")
            model.pop(k, None)
        states.append(dict(model))
    got = {r["id"]: r["val"] for r in t.snapshot().collect()}
    assert got == model
    # every committed version time-travels to the matching model state
    for v, want in zip(t._versions(), states):
        tv = {r["id"]: r["val"] for r in t.snapshot(version=v).collect()}
        assert tv == want


# --------------------------------------------------------------------------
# Concurrent-writer properties (VERDICT r7 item 7): interleaved writers
# either SERIALIZE (both effects present, versions linear) or ABORT cleanly
# (ConcurrentWriteError), and the log is never corrupted.
# --------------------------------------------------------------------------

import json
import os
import shutil

from ab_inbev_big_data_case_spark.sources.txlog import ConcurrentWriteError


@pytest.fixture(scope="module")
def seed_table(spark, tmp_path_factory):
    """One Spark-created table reused (by directory copy) across all
    protocol-schedule examples, so 200+ schedules cost no Spark jobs."""
    path = str(tmp_path_factory.mktemp("seed") / "t")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(8)], "id INT, val DOUBLE"
    )
    DeltaLiteTable.create(spark, df, path, keys=["id"])
    return path


# a writer step is (writer_idx, 'read'|'commit'); hypothesis generates the
# interleaving. Each writer reads the snapshot version once, prepares a
# synthetic add action, then attempts to commit at read_version+1 with
# retries drawn per-writer (0 = read-modify-write semantics, >0 = blind
# append semantics).
_N_WRITERS = 3
_SCHEDULES = st.lists(
    st.integers(min_value=0, max_value=_N_WRITERS - 1),
    min_size=2 * _N_WRITERS,
    max_size=2 * _N_WRITERS,
).filter(lambda s: all(s.count(i) == 2 for i in range(_N_WRITERS)))
_RETRIES = st.tuples(*[st.integers(min_value=0, max_value=5)] * _N_WRITERS)


@settings(max_examples=220, deadline=None)
@given(schedule=_SCHEDULES, retries=_RETRIES)
def test_commit_protocol_serializes_or_aborts(
    spark, seed_table, tmp_path_factory, schedule, retries
):
    """Any interleaving of N writers' (read, commit) phases: every commit
    lands at a UNIQUE contiguous version or raises ConcurrentWriteError;
    replay afterwards parses every committed action (log never corrupt)."""
    path = str(tmp_path_factory.mktemp("race") / "t")
    shutil.copytree(seed_table, path)
    t = DeltaLiteTable(spark, path)
    base = t.version()
    read_v: dict[int, int] = {}
    outcome: dict[int, int | str] = {}
    for step_writer in schedule:
        if step_writer not in read_v:  # first occurrence = read phase
            read_v[step_writer] = t._replay().version
        else:  # second occurrence = commit phase
            action = {
                "add": {
                    "path": f"race-{step_writer}.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                    "stats": "{}",
                }
            }
            try:
                outcome[step_writer] = t._commit(
                    read_v[step_writer] + 1,
                    [action],
                    {"operation": f"RACE-{step_writer}"},
                    retries=retries[step_writer],
                )
            except ConcurrentWriteError:
                outcome[step_writer] = "abort"
    committed = [v for v in outcome.values() if isinstance(v, int)]
    # unique versions, contiguous from base+1, no gaps
    assert len(set(committed)) == len(committed)
    assert sorted(committed) == list(range(base + 1, base + 1 + len(committed)))
    assert t._versions() == list(range(0, base + 1 + len(committed)))
    # replay parses the full log and sees exactly the winners' adds
    snap = t._replay()
    winners = {f"race-{w}.parquet" for w, v in outcome.items() if isinstance(v, int)}
    assert winners <= set(snap.adds)
    # every log file is valid JSON lines ending in commitInfo
    for v in t._versions():
        lines = open(
            os.path.join(t.log_dir, f"{v:020d}.json")
        ).read().splitlines()
        actions = [json.loads(ln) for ln in lines]
        assert "commitInfo" in actions[-1]


def test_real_race_append_vs_optimize(spark, tmp_path_factory):
    """Threaded append (blind, retries past races) vs OPTIMIZE (read-modify-
    write, retries=0): the append ALWAYS lands; OPTIMIZE either serializes
    (row multiset preserved) or aborts cleanly; rows are never lost."""
    import threading

    path = str(tmp_path_factory.mktemp("rt") / "t")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "id INT, val DOUBLE"
    )
    t = DeltaLiteTable.create(spark, df, path, keys=["id"])
    for i in range(3):  # small files so OPTIMIZE has work
        t.write(
            spark.createDataFrame([(100 + i, 0.0)], "id INT, val DOUBLE"),
            mode="append",
        )
    errs: list = []
    barrier = threading.Barrier(2)

    def do_append():
        barrier.wait()
        DeltaLiteTable(spark, path).write(
            spark.createDataFrame([(999, 9.0)], "id INT, val DOUBLE"),
            mode="append",
        )

    def do_optimize():
        barrier.wait()
        try:
            DeltaLiteTable(spark, path).optimize(target_file_bytes=1 << 20)
        except ConcurrentWriteError as e:
            errs.append(e)

    th = [threading.Thread(target=do_append), threading.Thread(target=do_optimize)]
    for x in th:
        x.start()
    for x in th:
        x.join()
    got = sorted(r["id"] for r in t.snapshot().collect())
    assert got == sorted(list(range(50)) + [100, 101, 102, 999])
    # versions are linear and replay is clean regardless of who won
    assert t._versions() == list(range(t.version() + 1))


def test_real_race_merge_vs_merge_disjoint_keys(spark, tmp_path_factory):
    """Two merges on DISJOINT keys race: at least one commits; a loser
    aborts with ConcurrentWriteError and its retry (fresh snapshot) applies
    cleanly — final state carries BOTH updates, no corruption."""
    import threading

    path = str(tmp_path_factory.mktemp("rm") / "t")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id INT, val DOUBLE"
    )
    t = DeltaLiteTable.create(spark, df, path, keys=["id"])
    barrier = threading.Barrier(2)

    def upd(k, v):
        def run():
            barrier.wait()
            for _ in range(5):  # caller-side retry loop on abort
                try:
                    DeltaLiteTable(spark, path).merge(
                        spark.createDataFrame([(k, v)], "id INT, val DOUBLE")
                    )
                    return
                except ConcurrentWriteError:
                    continue
            raise AssertionError("merge starved after 5 retries")

        return run

    th = [
        threading.Thread(target=upd(3, -3.0)),
        threading.Thread(target=upd(17, -17.0)),
    ]
    for x in th:
        x.start()
    for x in th:
        x.join()
    got = {r["id"]: r["val"] for r in t.snapshot().collect()}
    assert got[3] == -3.0 and got[17] == -17.0 and len(got) == 20
    assert t._versions() == list(range(t.version() + 1))
