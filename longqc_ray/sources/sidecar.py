"""Run-metadata sidecar ingest (S7 analogue).

The reference reads per-run platform sidecars next to the data files:
Sequel ``sts.xml`` productivity bins (lq_sequel.py:139-159 —
ProdDist/BinLabels + BinCounts → [Empty, Productive, Other] counts)
and RS-II ``sts.csv`` per-record score tables (lq_rs.py:13-15).
Recast for the audio-clip pipeline: a recording-run sidecar carries
channel-productivity bins (XML) or per-channel score rows (CSV); the
parsed scalars merge into the ``qc_summary`` report dict under
``run_*`` keys, exactly the role the reference's sts scalars play in
its sample-QC report.

Driver-side by design: sidecars are one tiny file per RUN (not per
record), so at cluster scale one task parses each run's sidecar and
the scalars broadcast with the report — never a per-record cost.
"""

from __future__ import annotations

import csv
import os
import xml.etree.ElementTree as ET


def parse_run_sidecar_xml(path: str) -> dict:
    """Productivity-bin XML → scalars (lq_sequel.parse_sts_xml shape):

    <RunStats run="...">
      <ProdDist>
        <BinLabels><BinLabel>Empty</BinLabel>...</BinLabels>
        <BinCounts><BinCount>123</BinCount>...</BinCounts>
      </ProdDist>
    </RunStats>

    Labels matched by substring (Empty / Productive / Other), counts
    positional — the same pairing rule the reference applies to the
    PacBio namespace-qualified variant.
    """
    root = ET.parse(path).getroot()
    labels = [e.text or "" for e in root.findall("./ProdDist/BinLabels/BinLabel")]
    counts = [int(e.text or 0) for e in root.findall("./ProdDist/BinCounts/BinCount")]
    p0 = p1 = p2 = 0
    for label, count in zip(labels, counts):
        if "Empty" in label:
            p0 = count
        elif "Productive" in label:
            p1 = count
        elif "Other" in label:
            p2 = count
    tot = p0 + p1 + p2
    return {
        "run_id": root.attrib.get("run", os.path.basename(path)),
        "run_n_empty": p0,
        "run_n_productive": p1,
        "run_n_other": p2,
        "run_productive_frac": (p1 / tot) if tot else 0.0,
    }


def parse_run_sidecar_csv(path: str) -> dict:
    """Per-channel score CSV → scalars (lq_rs.load_sts_csv shape:
    comma-separated table with HQRegionStart/HQRegionEnd/ReadScore
    columns, one row per channel). Aggregates driver-side — the file
    is O(channels per run), not O(records)."""
    n = 0
    score_sum = 0.0
    hq_len_sum = 0
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            n += 1
            score_sum += float(row["ReadScore"])
            hq_len_sum += int(row["HQRegionEnd"]) - int(row["HQRegionStart"])
    return {
        "run_id": os.path.basename(path),
        "run_n_channels": n,
        "run_mean_read_score": (score_sum / n) if n else 0.0,
        "run_total_hq_len": hq_len_sum,
    }


def load_run_metadata(path: str) -> dict:
    """Format-sniffing entry point (the S7 ingest dispatch): ``.xml``
    → productivity bins, ``.csv`` → channel score table."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".xml":
        return parse_run_sidecar_xml(path)
    if ext == ".csv":
        return parse_run_sidecar_csv(path)
    raise ValueError(f"unsupported run-metadata sidecar format: {path}")
