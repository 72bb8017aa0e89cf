"""Vectorized traversal and tally primitives (XLA now, Pallas variants later)."""
