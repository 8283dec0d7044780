"""Data layer: zarr-compatible storage, conditional datasets, prefetch loaders."""
