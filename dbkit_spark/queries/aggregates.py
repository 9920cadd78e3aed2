"""aggregates queries (filled in as operators land)."""
