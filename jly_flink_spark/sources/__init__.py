"""Source-side adapters: CDC envelope synthesis and streaming readers."""
