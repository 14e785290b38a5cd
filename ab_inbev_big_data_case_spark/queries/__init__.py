"""Named harness queries, one module per operator family (SURVEY.md §2.2).

Conventions shared by every query in this package:

- signature ``(spark: SparkSession, sf_dir: str) -> DataFrame``;
- every computed column aliased identically in Spark and oracle SQL;
- floating aggregates rounded (``round(x, 2)``) in BOTH engines — double
  summation order differs between Spark and DuckDB, so raw doubles would
  hash-mismatch at the last ulp;
- window ``ORDER BY`` clauses are total orders (ties broken by a key) and
  state null ordering explicitly in the oracle (Spark ASC default is NULLS
  FIRST, DuckDB's is NULLS LAST).
"""
