"""Dataset loaders and deterministic synthetic fixture generators."""
