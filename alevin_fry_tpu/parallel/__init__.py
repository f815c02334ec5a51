"""Multi-chip sharding: mesh construction and the data-parallel
quantification step (cells sharded over devices, collectives for the
barcode histogram merge)."""
