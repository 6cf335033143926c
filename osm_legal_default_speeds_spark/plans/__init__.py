"""Driver-side planning: rule compilation and the pure-Python
reference-semantics kernel."""
