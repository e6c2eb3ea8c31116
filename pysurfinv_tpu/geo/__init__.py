"""Geographic layer: grids, smoothing, 3-D model assembly, exchange."""
