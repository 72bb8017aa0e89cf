"""Numeric core and physics data objects (L0/L1 of the layer map)."""
