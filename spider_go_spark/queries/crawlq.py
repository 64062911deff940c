"""Placeholder — filled in below in this round."""
QUERIES = {}
ORACLES = {}
