"""MCMC inversion: point drivers, vmapped samplers, priors, posteriors."""
