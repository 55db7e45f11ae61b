"""Structured Streaming equivalents of the reference's orchestration."""
