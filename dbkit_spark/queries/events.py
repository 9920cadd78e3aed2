"""events queries (filled in as operators land)."""
