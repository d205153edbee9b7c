"""Per-family registry wrapper modules (see registry.py)."""
