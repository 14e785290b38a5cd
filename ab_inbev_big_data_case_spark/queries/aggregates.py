"""aggregates queries (filled in incrementally)."""
