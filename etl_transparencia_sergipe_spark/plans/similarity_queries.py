"""Similarity-search queries (J6, ANN over embeddings) — filled in as
operators land."""
