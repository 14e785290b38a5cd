"""streaming_twins queries (filled in incrementally)."""
