"""Device-mesh batch data parallelism (the MultipleProcesses analog)."""
