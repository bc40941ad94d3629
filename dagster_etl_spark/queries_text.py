"""Text-analysis queries (lang-id, quality, tokens, fingerprints) —
filled in as operators land."""
