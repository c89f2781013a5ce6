"""Structured Streaming wrapper (SURVEY §2.9 stretch goal)."""

from .stream import stream_extract  # noqa: F401
