"""Pure numpy/stdlib per-row kernels shared across stages and tests.

No Ray imports here — these are the deterministic compute primitives
the map_batches stages vectorize over. Keeping them Ray-free makes
them unit-testable against the oracle without a cluster.
"""
