"""Structured Streaming layer: the CDC pipeline (source -> parse -> route ->
sink with checkpoint/resume) and observability."""
