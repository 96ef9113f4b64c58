"""End-to-end BloomScene pipeline: progressive generation -> training ->
rendering -> compression."""
