"""Operational tools: topic admin and the synthetic order producer."""
