"""scalar queries (filled in incrementally)."""
