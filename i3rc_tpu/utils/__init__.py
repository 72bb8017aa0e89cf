"""L0 foundation utilities: error policy, namelist config, conversions."""
