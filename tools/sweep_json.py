"""Full local correctness sweep → CHECK_SWEEP_r{N}.json.

Replicates the driver's gate over EVERY queries() entry (the driver
itself checks only its first-50 window): row/schema/value compare vs
the DuckDB oracle where one exists, rows-only otherwise.

Usage: python tools/sweep_json.py <out.json> [sf_dir]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from tools.check_oracle import run_checks
    import __ray_entry__ as entrymod
    t0 = time.time()
    results = run_checks(sf_dir, verbose=True)
    sqls = set(entrymod.oracle_sql())
    doc = {
        "sf_dir": sf_dir,
        "forced_scale_paths": os.environ.get("LONGQC_FORCE_SCALE_PATHS", "0")
        not in ("", "0"),
        "wall_s": round(time.time() - t0, 1),
        "n_queries": len(results),
        "n_sql_backed": sum(1 for k in results if k in sqls),
        "n_pass": sum(1 for k, v in results.items() if k in sqls and not v),
        "n_rows_only_ok": sum(1 for k, v in results.items() if k not in sqls and not v),
        "n_fail": sum(1 for v in results.values() if v),
        "results": {k: ("pass" if not v else v) if k in sqls else ("rows_only_ok" if not v else v)
                    for k, v in results.items()},
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print("wrote", out_path, {k: doc[k] for k in ("n_queries", "n_pass", "n_rows_only_ok", "n_fail")})
    ray.shutdown()
    return 1 if doc["n_fail"] else 0

if __name__ == "__main__":
    sys.exit(main())
