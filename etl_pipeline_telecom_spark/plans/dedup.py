"""Placeholder plan module — filled in a later milestone."""
