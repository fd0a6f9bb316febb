"""Operator modules; importing each registers its queries (registry.py)."""
