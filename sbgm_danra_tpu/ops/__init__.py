"""Device-side numerics: Pallas kernels and jittable image ops."""
