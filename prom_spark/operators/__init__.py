"""Distributed operators: selection, dedup, ANN, connected components."""
