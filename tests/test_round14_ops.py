"""Round-14 regression tests.

Gate hardening: after the r13 driver reds (hash-only mismatches on the
three occupancy reports — the only registered queries with bare
DECIMAL(38,0) output columns), tools/check_oracle.py must fail locally on
any scale-0 decimal output column so the local gate fails exactly where
the driver fails (the round-3 HUGEINT playbook, extended one type over).
"""

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_check_oracle():
    spec = importlib.util.spec_from_file_location(
        "check_oracle", os.path.join(REPO, "tools", "check_oracle.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_decimal_gate_flags_scale0_spark_output(spark):
    co = _load_check_oracle()
    df = spark.sql(
        "SELECT CAST(1 AS DECIMAL(38,0)) AS mass, CAST(1.5 AS DECIMAL(29,2)) AS ok"
    )
    probs = co.decimal_problems(df, [], [])
    assert len(probs) == 1 and "[mass]" in probs[0], probs


def test_decimal_gate_flags_scale0_duckdb_output(spark):
    co = _load_check_oracle()
    df = spark.sql("SELECT CAST(1 AS BIGINT) AS mass")
    probs = co.decimal_problems(df, ["mass", "r"], ["DECIMAL(38,0)", "DOUBLE"])
    assert len(probs) == 1 and "[mass]" in probs[0], probs


def test_decimal_gate_allows_scaled_decimal_precedent(spark):
    # dp_gaussian_sum's decimal(29,2) is the driver-green precedent for
    # scale-rendered decimals — the gate must not flag it.
    co = _load_check_oracle()
    df = spark.sql("SELECT CAST(1.5 AS DECIMAL(29,2)) AS exact_clipped_sum")
    assert co.decimal_problems(df, ["exact_clipped_sum"], ["DECIMAL(29,2)"]) == []


def test_no_registered_query_outputs_scale0_decimal(spark, sf_dir):
    """Plan-level sweep: no registered query may output a scale-0 decimal
    column (driver-hash-unsafe). Schemas only — nothing executes."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as e
    from pyspark.sql.types import DecimalType

    bad = []
    for name, fn in e.queries().items():
        try:
            sdf = fn(spark, sf_dir)
        except Exception:
            continue  # build errors are other tests' business
        for f in sdf.schema.fields:
            if isinstance(f.dataType, DecimalType) and f.dataType.scale == 0:
                bad.append(f"{name}.{f.name}:{f.dataType.simpleString()}")
    assert not bad, bad
