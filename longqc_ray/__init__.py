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


def _tune_malloc() -> bool:
    """Raise glibc's dynamic mmap/trim thresholds so multi-MB batch
    temporaries (decoded PCM matrices, rfft outputs, Arrow scratch)
    are served from the reused heap instead of a fresh ``mmap`` that
    is ``munmap``ed on free. Under a full worker pool the default
    mmap-per-allocation behavior causes cross-process TLB-shootdown
    storms — measured on this VM as 62% sys + 26% steal time and a
    ~8× wall-clock collapse of an embarrassingly-parallel 32-process
    FFT control; with the thresholds raised the same control runs at
    ~100% user time and near-ideal scaling (BASELINE.md §host-phase).

    Runs once at import, so every Ray worker that executes this
    package's stages inherits it. Returns False (and changes nothing)
    on non-glibc platforms. Cost: freed heap blocks below 64 MiB are
    retained per process (high-water-mark RSS), bounded by per-worker
    batch sizing.
    """
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        m_trim_threshold, m_mmap_threshold = -1, -3
        cap = 64 * 1024 * 1024
        return bool(
            libc.mallopt(m_mmap_threshold, cap) and libc.mallopt(m_trim_threshold, cap)
        )
    except Exception:
        return False


_MALLOC_TUNED = _tune_malloc()
