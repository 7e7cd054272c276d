"""Sources: deterministic synthetic generators and table readers."""
