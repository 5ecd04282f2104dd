"""longqc_ray — a Ray-Data-native quality-filter engine.

A from-scratch reimagination of the QC-and-filter core of
yfukasawa/LongQC (reference at /root/reference, studied in SURVEY.md)
as a language-ID + quality + PII/toxicity keep/drop pipeline over
tables of audio clip + transcript rows.

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` scans →
zero-copy Arrow ``map_batches`` stages → actor pools for model scorers
→ grouped aggregates for summaries → partitioned parquet sinks with
per-partition lineage for exact resume.

Package layout
--------------
- ``config``     thresholds / presets (analogue of longQC.py:171-233 presets)
- ``kernels``    pure numpy/stdlib per-row compute shared by engine + tests
- ``fixtures``   deterministic synthetic clips-table generator (FIXTURES.md F1)
- ``oracle``     independent per-row reference implementation (the spec)
- ``stages``     stateless map_batches stages
- ``state``      model builders + stateful actor-pool scorers
- ``functions``  aggregate-layer math (N50, gamma/GMM/EM fits, reservoir)
- ``pipelines``  end-to-end pipelines incl. the flagship quality filter
- ``sources``    readers/writers + lineage/resume
"""

__version__ = "0.1.0"
