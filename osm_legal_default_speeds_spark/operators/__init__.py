"""Distributed operators (DataFrame -> DataFrame transformations)."""
