"""Model parameterization: B-splines, thermal models, layers, 1-D models."""
