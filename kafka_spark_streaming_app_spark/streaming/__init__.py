"""Structured Streaming layer: wire-format parsing, watermarking, sinks,
and multi-sink fan-out."""
