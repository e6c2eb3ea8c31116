"""TPU compute core: flattening, secular functions, dispersion, kernels."""
