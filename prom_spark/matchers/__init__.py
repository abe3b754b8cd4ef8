"""Matchers: label analysis, lexical, structural, string, and ABox."""
