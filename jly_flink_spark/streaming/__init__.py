"""Structured Streaming parity for the reference pipeline: file-source
envelope streams, foreachBatch dual sinks with label idempotency,
checkpoint recovery, and event-time windowing capabilities."""
