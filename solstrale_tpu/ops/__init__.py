"""Compute kernels: counter-based RNG, intersection sweeps, Pallas fast
paths."""
