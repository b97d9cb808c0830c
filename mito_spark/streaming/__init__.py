"""Streaming surface: the reference's continuation (`want_more`)
protocol, cursor tracking, and Structured Streaming equivalents."""
