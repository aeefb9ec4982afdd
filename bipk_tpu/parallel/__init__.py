"""Particle-mesh sharding: shard_map sweeps with psum weight collectives."""
