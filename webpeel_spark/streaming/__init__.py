"""Structured-Streaming form of the extraction stage (watch-mode analog)."""
