"""Data sources: deterministic synthetic pages generator (tests/bench)."""
