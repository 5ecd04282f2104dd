"""Aggregate-layer math: quantile/NXX, distribution fits, sampling."""
