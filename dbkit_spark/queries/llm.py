"""llm queries (filled in as operators land)."""
