"""llm queries (filled in incrementally)."""
