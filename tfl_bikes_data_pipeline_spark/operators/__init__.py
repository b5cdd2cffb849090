"""Operator library: join/top-k/window compositions plus the
large-scale training-data extensions (dedup, similarity search, text
analysis, multimodal plumbing)."""
