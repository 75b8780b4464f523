"""Utilities: torch checkpoint conversion, checkpointing, logging."""
