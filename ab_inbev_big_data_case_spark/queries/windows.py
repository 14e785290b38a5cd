"""windows queries (filled in incrementally)."""
