"""Static HTML QC report sink — the S11 analogue (longQC.py:826-841
renders an HTML report from the computed stats; here the same role is
filled without matplotlib/jinja: the report is assembled from the
``qc_summary`` dict and the binned stats frame into one self-contained
HTML string with inline-SVG charts).

Design: single-hue bars (one series per chart → no legend), direct
labels in text ink (never the series color), native ``<title>`` hover
tooltips, a full data table under each chart (the accessibility table
view), recessive axis lines. Colors are the validated default palette
(light surface #fcfcfb, ink #0b0b0b/#52514e, series blue #2a78d6).
"""

from __future__ import annotations

import html
from typing import Any

_SURFACE = "#fcfcfb"
_INK = "#0b0b0b"
_INK2 = "#52514e"
_BLUE = "#2a78d6"
_GRID = "#e4e3df"

_CSS = f"""
body {{ background:{_SURFACE}; color:{_INK};
       font:14px/1.45 system-ui,-apple-system,sans-serif;
       max-width:880px; margin:2rem auto; padding:0 1rem; }}
h1 {{ font-size:1.4rem; }} h2 {{ font-size:1.05rem; margin-top:2rem; }}
table {{ border-collapse:collapse; width:100%; font-size:13px; }}
th, td {{ text-align:left; padding:3px 10px 3px 0;
          border-bottom:1px solid {_GRID}; }}
th {{ color:{_INK2}; font-weight:600; }}
td.num {{ font-variant-numeric:tabular-nums; }}
.warn {{ color:#8a5a00; }} .err {{ color:#a11a1a; }}
.muted {{ color:{_INK2}; }}
.hero {{ font-size:2.2rem; font-weight:700; }}
.herolabel {{ color:{_INK2}; font-size:0.85rem; }}
.tiles {{ display:flex; gap:2.5rem; flex-wrap:wrap; margin:1rem 0; }}
"""


def _fmt(v: Any) -> str:
    if isinstance(v, float):
        return f"{v:,.4g}"
    if isinstance(v, int):
        return f"{v:,}"
    return html.escape(str(v))


def _hbar_svg(items: list[tuple[str, int]], title: str) -> str:
    """Horizontal bar chart, one series: single hue, 2px gaps, direct
    value labels in ink, <title> hover tooltip per bar."""
    if not items:
        return '<p class="muted">no rows</p>'
    items = sorted(items, key=lambda kv: -kv[1])
    vmax = max(v for _, v in items) or 1
    bar_h, gap, label_w, chart_w = 18, 2, 150, 420
    h = len(items) * (bar_h + gap)
    rows = []
    for i, (k, v) in enumerate(items):
        y = i * (bar_h + gap)
        w = max(round(v / vmax * (chart_w - 60)), 1)
        lbl = html.escape(str(k))
        rows.append(
            f'<text x="{label_w - 8}" y="{y + 13}" text-anchor="end" '
            f'fill="{_INK2}" font-size="12">{lbl}</text>'
            f'<rect x="{label_w}" y="{y}" width="{w}" height="{bar_h}" '
            f'rx="2" fill="{_BLUE}"><title>{lbl}: {v:,}</title></rect>'
            f'<text x="{label_w + w + 6}" y="{y + 13}" fill="{_INK}" '
            f'font-size="12">{v:,}</text>'
        )
    return (
        f'<svg role="img" aria-label="{html.escape(title)}" '
        f'width="{label_w + chart_w}" height="{h}" '
        f'font-family="system-ui,sans-serif">{"".join(rows)}</svg>'
    )


def _vbar_svg(labels: list[str], values: list[float], title: str,
              vmax: float | None = None) -> str:
    """Vertical bar chart, one series, fractional values in [0, vmax]."""
    if not labels:
        return '<p class="muted">no rows</p>'
    vmax = vmax or (max(values) or 1.0)
    bw, gap, ch, pad = 26, 2, 120, 22
    w = len(labels) * (bw + gap) + pad
    rows = [
        f'<line x1="{pad}" y1="{ch}" x2="{w}" y2="{ch}" '
        f'stroke="{_GRID}" stroke-width="1"/>'
    ]
    for i, (k, v) in enumerate(zip(labels, values)):
        x = pad + i * (bw + gap)
        bh = max(round(v / vmax * (ch - 14)), 1)
        lbl = html.escape(str(k))
        rows.append(
            f'<rect x="{x}" y="{ch - bh}" width="{bw}" height="{bh}" rx="2" '
            f'fill="{_BLUE}"><title>{lbl}: {v:.3g}</title></rect>'
            f'<text x="{x + bw / 2}" y="{ch + 14}" text-anchor="middle" '
            f'fill="{_INK2}" font-size="10">{lbl}</text>'
        )
    return (
        f'<svg role="img" aria-label="{html.escape(title)}" '
        f'width="{w}" height="{ch + 18}" '
        f'font-family="system-ui,sans-serif">{"".join(rows)}</svg>'
    )


def render_qc_html(summary: dict, binned) -> str:
    """Self-contained HTML report from a ``qc_summary`` dict + the
    ``binned_quality_stats`` frame. Pure string assembly — safe to run
    on the driver, no figure library, deterministic output."""
    n = int(summary.get("n_clips", 0))
    keep = int(summary.get("n_keep", 0))
    tiles = (
        f'<div class="tiles">'
        f'<div><div class="hero">{n:,}</div>'
        f'<div class="herolabel">clips</div></div>'
        f'<div><div class="hero">{keep / max(n, 1):.1%}</div>'
        f'<div class="herolabel">kept</div></div>'
        f'<div><div class="hero">{_fmt(summary.get("mean_snr_db", 0.0))}</div>'
        f'<div class="herolabel">mean SNR (dB)</div></div>'
        f'<div><div class="hero">{_fmt(summary.get("dur_n50_ms", 0))}</div>'
        f'<div class="herolabel">duration N50 (ms)</div></div>'
        f"</div>"
    )

    drops = {k: v for k, v in summary.get("drop_reasons", {}).items() if k}
    drop_svg = _hbar_svg(list(drops.items()), "drop reasons")
    drop_tbl = "".join(
        f'<tr><td>{html.escape(str(k))}</td><td class="num">{v:,}</td></tr>'
        for k, v in sorted(drops.items(), key=lambda kv: -kv[1])
    )

    bin_svg, bin_tbl = '<p class="muted">no bins</p>', ""
    if binned is not None and len(binned):
        b = binned.sort_values("dur_bin")
        bin_svg = _vbar_svg(
            [str(int(x)) for x in b["dur_bin"]],
            [float(x) for x in b["keep_frac"]],
            "keep fraction per duration bin", vmax=1.0,
        )
        bin_tbl = "".join(
            "<tr>" + "".join(
                f'<td class="num">{_fmt(row[c])}</td>'
                for c in ("dur_bin", "n", "keep_frac", "snr_q25",
                          "snr_median", "snr_q75")
            ) + "</tr>"
            for _, row in b.iterrows()
        )

    scalars = {
        k: v for k, v in summary.items()
        if isinstance(v, (int, float, str)) and k not in ("warns", "errors")
    }
    scalar_tbl = "".join(
        f'<tr><th>{html.escape(k)}</th><td class="num">{_fmt(v)}</td></tr>'
        for k, v in sorted(scalars.items())
    )
    notes = "".join(
        f'<li class="warn">{html.escape(str(w))}</li>'
        for w in summary.get("warns", [])
    ) + "".join(
        f'<li class="err">{html.escape(str(e))}</li>'
        for e in summary.get("errors", [])
    )

    return f"""<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<title>longqc_ray QC report</title><style>{_CSS}</style></head>
<body>
<h1>longqc_ray QC report</h1>
{tiles}
<h2>Drop reasons</h2>
{drop_svg}
<table><thead><tr><th>reason</th><th>clips</th></tr></thead>
<tbody>{drop_tbl}</tbody></table>
<h2>Keep fraction by duration bin</h2>
{bin_svg}
<table><thead><tr><th>bin</th><th>n</th><th>keep_frac</th>
<th>snr_q25</th><th>snr_median</th><th>snr_q75</th></tr></thead>
<tbody>{bin_tbl}</tbody></table>
<h2>Warnings / errors</h2>
<ul>{notes or '<li class="muted">none</li>'}</ul>
<h2>All metrics</h2>
<table><tbody>{scalar_tbl}</tbody></table>
</body></html>"""


def write_qc_report_html(sf_dir: str, out_path: str) -> str:
    """Drive the QC pipeline over the derived clips of ``sf_dir`` and
    write the HTML report; returns ``out_path``. Ray must already be
    initialised (driver contract)."""
    from ..pipelines.multimodal import read_derived_clips
    from ..pipelines.qc_summary import binned_quality_stats, qc_summary
    from ..pipelines.quality_filter import label_clips

    labeled = label_clips(read_derived_clips(sf_dir), scorer_concurrency=(1, 4))
    labeled = labeled.materialize()
    summary = qc_summary(labeled)
    binned = binned_quality_stats(labeled)
    doc = render_qc_html(summary, binned)
    with open(out_path, "w") as f:
        f.write(doc)
    return out_path
