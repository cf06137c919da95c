"""Structured Streaming layer: the reference's event-driven runtime
(event bus pub/sub, execution streams, shared state, checkpoint/resume —
core/framework/runtime/) re-expressed as streaming queries (SURVEY §2.9).
"""
