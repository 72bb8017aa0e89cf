"""Preprocessing tools (L4): Mie tables and property-file converters."""
