"""Assembly orchestration layer (reference: src/scripts/* + src/clustering.py)."""
