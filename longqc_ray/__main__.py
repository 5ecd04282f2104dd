"""CLI — the analogue of the reference's ``longQC.py runqc|sampleqc|help``
subcommand surface (/root/reference/longQC.py:876-954), re-expressed
for the Ray engine:

    python -m longqc_ray filter --input DIR --out DIR [--preset NAME]
        resumable flagship quality filter (sampleqc analogue): reads
        parquet clip shards, writes kept+scrubbed rows per unit with a
        lineage manifest; re-running skips finished units.
    python -m longqc_ray segment --input DIR --out DIR
        resumable VAD utterance-segment export (long audio -> clips),
        same unit/manifest/resume discipline as filter.
    python -m longqc_ray augment --input DIR --out DIR [--variants S]
        resumable waveform-augmentation export (speed/gain/seeded
        noise; per-row deterministic, so redone units are exact).
    python -m longqc_ray report --input DIR [--preset NAME]
        QC summary JSON to stdout (runqc/platform-QC analogue).
    python -m longqc_ray query NAME [--sf DIR]
        run one queries() entry from __ray_entry__ and print it.
    python -m longqc_ray list
        list available queries and presets.

This module OWNS its Ray session (like bench.py and the test
fixture); the library never calls ray.init itself.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


_OWNS_SESSION = False


def _resolve_address(flag: str | None) -> str:
    """Explicit --address wins; else $RAY_ADDRESS (set by the Ray job
    runtime inside ``ray job submit`` drivers); else a local session."""
    return flag or os.environ.get("RAY_ADDRESS") or "local"


def _init_ray(cpus: int | None, address: str | None = None) -> None:
    """Open this process's Ray session.

    ``address`` resolution makes the same CLI work as a laptop command
    AND as a ``ray job submit`` driver on a multi-node cluster:
    explicit ``--address`` wins; else $RAY_ADDRESS (which the Ray job
    runtime sets to the cluster address inside submitted jobs — so
    ``ray job submit -- python -m longqc_ray filter ...`` connects to
    the cluster with no extra flags); else a fresh local session.
    ``num_cpus`` is only legal for a NEW local session — when joining
    an existing cluster the cluster's resources are authoritative."""
    global _OWNS_SESSION
    import ray

    if not ray.is_initialized():
        addr = _resolve_address(address)
        kwargs = dict(include_dashboard=False, logging_level="ERROR")
        if addr == "local":
            kwargs["num_cpus"] = cpus
        elif cpus is not None:
            print(
                f"warning: --cpus {cpus} ignored — joining the existing "
                f"Ray cluster at {addr!r}, whose resources are authoritative",
                file=sys.stderr,
            )
        ray.init(address=addr, **kwargs)
        _OWNS_SESSION = True
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _config_for(preset: str):
    from .config import PRESETS

    if preset not in PRESETS:
        raise SystemExit(f"unknown preset {preset!r}; choose from {sorted(PRESETS)}")
    return PRESETS[preset]


def cmd_filter(args: argparse.Namespace) -> int:
    _init_ray(args.cpus, args.address)
    from .sources.lineage import run_filter_resumable

    summary = run_filter_resumable(
        args.input,
        args.out,
        config=_config_for(args.preset),
        shards_per_unit=args.shards_per_unit,
    )
    print(json.dumps(summary))
    return 0


def cmd_segment(args: argparse.Namespace) -> int:
    _init_ray(args.cpus, args.address)
    from .sources.lineage import run_segments_resumable

    summary = run_segments_resumable(
        args.input,
        args.out,
        shards_per_unit=args.shards_per_unit,
        min_dur_ms=args.min_dur_ms,
    )
    print(json.dumps(summary))
    return 0


def cmd_augment(args: argparse.Namespace) -> int:
    _init_ray(args.cpus, args.address)
    from .sources.lineage import run_augment_resumable

    summary = run_augment_resumable(
        args.input,
        args.out,
        shards_per_unit=args.shards_per_unit,
        variants=tuple(args.variants.split(",")),
    )
    print(json.dumps(summary))
    return 0


def cmd_report(args: argparse.Namespace) -> int:
    _init_ray(args.cpus, args.address)
    from .pipelines.quality_filter import label_clips
    from .pipelines.util import read_wide_parquet
    from .pipelines.qc_summary import qc_summary
    import glob

    shards = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not shards:
        raise SystemExit(f"no parquet shards under {args.input}")
    labeled = label_clips(read_wide_parquet(shards), config=_config_for(args.preset))
    if args.html:
        from .pipelines.qc_summary import binned_quality_stats
        from .sources.report_html import render_qc_html

        labeled = labeled.materialize()
        summary = qc_summary(labeled)
        with open(args.html, "w") as f:
            f.write(render_qc_html(summary, binned_quality_stats(labeled)))
        print(json.dumps({"html": args.html, "n_clips": summary["n_clips"]}))
        return 0
    print(json.dumps(qc_summary(labeled), indent=2, default=str))
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    _init_ray(args.cpus, args.address)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    if args.name not in qs:
        raise SystemExit(f"unknown query {args.name!r}; see `python -m longqc_ray list`")
    from tools.check_oracle import to_pandas

    df = to_pandas(qs[args.name](args.sf))
    print(df.head(args.head).to_string())
    print(f"... {len(df)} rows total")
    return 0


def cmd_list(args: argparse.Namespace) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    from .config import PRESETS

    sql = set(entrymod.oracle_sql())
    for name in sorted(entrymod.queries()):
        mark = "sql-checked" if name in sql else "rows-only"
        print(f"{name:28s} {mark}")
    print(f"presets: {', '.join(sorted(PRESETS))}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="longqc_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("filter", help="resumable quality filter (sampleqc analogue)")
    f.add_argument("--input", required=True, help="directory of parquet clip shards")
    f.add_argument("--out", required=True, help="output directory (manifest + parts)")
    f.add_argument("--preset", default="default")
    f.add_argument("--shards-per-unit", type=int, default=4)
    f.add_argument("--cpus", type=int, default=None)
    f.add_argument("--address", default=None,
                   help="Ray address (default: $RAY_ADDRESS or a local session)")
    f.set_defaults(fn=cmd_filter)

    s = sub.add_parser(
        "segment", help="resumable VAD utterance-segment export (long audio -> clips)"
    )
    s.add_argument("--input", required=True, help="directory of parquet clip shards")
    s.add_argument("--out", required=True, help="output directory (manifest + parts)")
    s.add_argument("--shards-per-unit", type=int, default=4)
    s.add_argument("--min-dur-ms", type=int, default=100)
    s.add_argument("--cpus", type=int, default=None)
    s.add_argument("--address", default=None,
                   help="Ray address (default: $RAY_ADDRESS or a local session)")
    s.set_defaults(fn=cmd_segment)

    a = sub.add_parser(
        "augment", help="resumable waveform-augmentation export (speed/gain/noise)"
    )
    a.add_argument("--input", required=True, help="directory of parquet clip shards")
    a.add_argument("--out", required=True, help="output directory (manifest + parts)")
    a.add_argument("--shards-per-unit", type=int, default=4)
    a.add_argument("--variants", default="speed:0.9,speed:1.1,noise:20",
                   help="comma-separated variant specs (speed:F|gain:DB|noise:SNRDB)")
    a.add_argument("--cpus", type=int, default=None)
    a.add_argument("--address", default=None,
                   help="Ray address (default: $RAY_ADDRESS or a local session)")
    a.set_defaults(fn=cmd_augment)

    r = sub.add_parser("report", help="QC summary JSON (runqc analogue)")
    r.add_argument("--input", required=True)
    r.add_argument("--preset", default="default")
    r.add_argument("--cpus", type=int, default=None)
    r.add_argument("--address", default=None,
                   help="Ray address (default: $RAY_ADDRESS or a local session)")
    r.add_argument("--html", default=None,
                   help="also write a self-contained HTML report (S11 analogue)")
    r.set_defaults(fn=cmd_report)

    q = sub.add_parser("query", help="run one registered query")
    q.add_argument("name")
    q.add_argument("--sf", default="/root/testdata/sf0.001")
    q.add_argument("--head", type=int, default=10)
    q.add_argument("--cpus", type=int, default=None)
    q.add_argument("--address", default=None,
                   help="Ray address (default: $RAY_ADDRESS or a local session)")
    q.set_defaults(fn=cmd_query)

    l = sub.add_parser("list", help="list queries and presets")
    l.set_defaults(fn=cmd_list)

    args = p.parse_args(argv)
    rc = args.fn(args)
    # only tear down a session this process opened (an embedding
    # caller — tests, a driver — keeps its own session)
    if _OWNS_SESSION:
        import ray

        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
