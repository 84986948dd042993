"""Distributed (multi-chip) tier — populated with shard_map solvers."""
