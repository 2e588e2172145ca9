"""Structured-streaming twins of the batch event operators."""
