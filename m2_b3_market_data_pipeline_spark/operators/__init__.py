"""Core relational operators + LLM-data-pipeline expansion operators."""
