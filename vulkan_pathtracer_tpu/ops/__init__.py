"""Device-side math kernels (JAX / Pallas)."""
