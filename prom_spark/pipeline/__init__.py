"""End-to-end KG-construction pipeline stages."""
