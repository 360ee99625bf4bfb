"""Ray Data stages: stateless map_batches functions and actor-pool classes."""
