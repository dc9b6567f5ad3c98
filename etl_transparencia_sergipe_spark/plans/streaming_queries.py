"""Windowed event queries (§2.10 batch equivalents) — filled in as
operators land."""
