"""Scale/beyond-parity queries (dedup, similarity, windows) — filled in
as operators land."""
