"""setops queries (filled in incrementally)."""
