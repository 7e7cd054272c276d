"""End-to-end jobs: session tuning, partition layout, resumable pipeline."""
