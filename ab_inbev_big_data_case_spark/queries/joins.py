"""joins queries (filled in incrementally)."""
