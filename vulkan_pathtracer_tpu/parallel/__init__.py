"""Device mesh + sharded rendering (ICI collectives via shard_map)."""
