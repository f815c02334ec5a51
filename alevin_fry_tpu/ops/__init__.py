"""JAX / vectorized-NumPy compute kernels for the quantification engine."""
