"""Structured Streaming restatements of the batch operators."""
