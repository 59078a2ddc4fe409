"""Structured Streaming ingest (green-field extension — the reference is
pure batch, SURVEY §2.11)."""
