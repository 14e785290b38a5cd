"""Relational operators: thin, composable DataFrame transforms.

Every function takes and returns a ``pyspark.sql.DataFrame`` so operators
compose into pipelines and register directly in the driver's correctness
harness. No RDDs, no custom physical layer — the plan is handed to Catalyst.
"""
