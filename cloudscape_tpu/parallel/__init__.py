"""Multi-chip scaling: tile sharding over a device mesh."""
