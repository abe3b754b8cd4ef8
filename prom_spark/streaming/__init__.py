"""Structured Streaming surface of the KG pipeline."""
