"""Per-stage wall-time audit of the flagship pipeline (ds.stats()).

Runs the flagship over the cached bench fixture and prints Ray Data's
per-operator stats summary — the evidence that wall time is dominated
by useful compute (the fused feature+scorer+rules actor stage), not by
scheduling, shuffles, or format conversions.

Usage: python tools/stage_audit.py [--cpus N] [--profile tiny|small|bench]
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    cpus = int(args[args.index("--cpus") + 1]) if "--cpus" in args else 32
    profile = args[args.index("--profile") + 1] if "--profile" in args else "bench"

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from longqc_ray.fixtures import fixture_dir
    from longqc_ray.pipelines.quality_filter import filter_clips
    from longqc_ray.pipelines.util import read_wide_parquet
    from longqc_ray.state.scorers import put_model_refs

    clips = sorted(glob.glob(os.path.join(fixture_dir(profile), "clips", "*.parquet")))
    refs = put_model_refs()
    pool = max(2, (cpus * 5) // 8)
    kept = filter_clips(read_wide_parquet(clips), scorer_concurrency=pool, model_refs=refs)
    mat = kept.materialize()  # stats live on the executed plan
    print(f"rows_out={mat.count()}\n")
    print(mat.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
