"""windows queries (filled in as operators land)."""
