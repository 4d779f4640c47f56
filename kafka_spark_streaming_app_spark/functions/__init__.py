"""Scalar/column helper functions (all built-in-expression based)."""
