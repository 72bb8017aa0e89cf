"""Artifact formats: netCDF domain / phase-table / results files."""
