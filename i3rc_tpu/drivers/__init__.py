"""End-user programs (L3): the monteCarloDriver and planeParallel analogs."""
