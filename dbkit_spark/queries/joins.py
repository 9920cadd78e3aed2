"""joins queries (filled in as operators land)."""
