"""Cross-cutting utilities: profiling, timing."""
