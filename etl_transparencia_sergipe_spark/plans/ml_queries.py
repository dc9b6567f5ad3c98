"""ML-parity queries (A4-A6: scaler/KMeans/correlation) — filled in as
operators land."""
