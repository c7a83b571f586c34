"""Structured Streaming layer: window operators + micro-batch runner."""
