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
