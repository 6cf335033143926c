"""Multimodal payload layer (graft axis B): image+caption tables as
opaque binary columns with typed metadata, processed by Arrow-batched
vectorized UDFs (no per-row Python)."""
