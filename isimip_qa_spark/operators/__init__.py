"""Composite operators beyond single expressions: multimodal column
plumbing, reusable dedup/ANN building blocks live in queries/ for now."""
