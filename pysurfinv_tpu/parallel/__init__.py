"""Device-mesh sharding: grid points and chains across chips over ICI."""
