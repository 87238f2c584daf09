"""Structured Streaming variants of the engine's operators."""
