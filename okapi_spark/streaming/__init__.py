"""Streaming layer.

The reference (Giraph) is purely batch-synchronous — SURVEY.md §2.c
marks streaming "absent, don't build" — so this package only hosts the
Structured-Streaming variants of pipeline functions that have one
(sessionization today). Kept as a first-class package so stream-native
operators land somewhere obvious.
"""

from okapi_spark.functions.sessions import sessionize_stream

__all__ = ["sessionize_stream"]
