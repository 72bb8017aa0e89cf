"""L2: the Monte Carlo photon-transport solver."""
