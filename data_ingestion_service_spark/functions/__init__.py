"""Reusable column-expression helpers (pure built-in functions; JVM-side)."""
