"""Utilities: pytree helpers, metrics writers, drawing, debug validation."""
