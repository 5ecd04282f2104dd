"""Stateless map_batches stages (Arrow in / Arrow out)."""
