"""Reusable column-expression builders (no I/O, no UDFs)."""
