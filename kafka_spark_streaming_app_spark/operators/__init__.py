"""Operators: pure DataFrame -> DataFrame transforms, batch/streaming dual."""
