"""scalars queries (filled in as operators land)."""
