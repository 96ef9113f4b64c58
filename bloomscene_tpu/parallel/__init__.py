"""Device-mesh parallelism: DP over cameras, tile/splat sharding over ICI."""
