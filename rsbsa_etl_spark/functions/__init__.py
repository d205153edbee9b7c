"""Scalar, text, dedup, similarity, and multimodal function surface."""
