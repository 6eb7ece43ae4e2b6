"""Chart rendering for report artifacts — dependency-free SVG.

The reference ships two matplotlib entry points (reference
plots_from_spark_outputs.py:42-127 `save_bar` with sorted-desc bars,
shortened x labels, value labels, dashed y grid; reference
integratedplots_query.py:16-43 engagement-vs-spend scatter over
spenders only). This environment has no matplotlib, and charts are
driver-side REPORT artifacts over already-bounded aggregates (top-10
frames, segment counts) — never engine operators — so the engine
renders them as SVG with the standard library: deterministic output,
testable as XML, viewable anywhere.

Scale note: every chart input here is a collected top-N / small
aggregate (the same frames the reference plots). Rendering never sees
raw data; the bound lives in the query (TakeOrderedAndProject), not in
the renderer.
"""

from __future__ import annotations

import math
from xml.sax.saxutils import escape

_W, _H = 1100, 600
_MARGIN = {"left": 90, "right": 30, "top": 60, "bottom": 120}


def shorten_label(value: object, max_len: int = 18) -> str:
    """Reference label hygiene (plots_from_spark_outputs.py:17-20):
    truncate long category labels with an ellipsis."""
    s = str(value)
    return s if len(s) <= max_len else s[:max_len] + "..."


def _nice_ticks(hi: float, n: int = 5) -> list[float]:
    """Round tick steps (1/2/5 × 10^k) from 0 to ≥hi."""
    if hi <= 0:
        return [0.0, 1.0]
    raw = hi / n
    mag = 10 ** math.floor(math.log10(raw))
    for mult in (1, 2, 5, 10):
        step = mult * mag
        if raw <= step:
            break
    top = math.ceil(hi / step) * step
    k = int(round(top / step))
    return [round(i * step, 10) for i in range(k + 1)]


def _svg_open(title: str) -> list[str]:
    return [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" '
        f'height="{_H}" viewBox="0 0 {_W} {_H}" '
        'font-family="Helvetica, Arial, sans-serif">',
        f'<rect width="{_W}" height="{_H}" fill="white"/>',
        f'<text x="{_W / 2}" y="30" text-anchor="middle" font-size="20" '
        f'font-weight="bold" class="title">{escape(title)}</text>',
    ]


def _axes_and_grid(lines: list[str], ticks: list[float], y_of) -> None:
    x0, x1 = _MARGIN["left"], _W - _MARGIN["right"]
    for t in ticks:
        y = y_of(t)
        lines.append(
            f'<line x1="{x0}" y1="{y:.1f}" x2="{x1}" y2="{y:.1f}" '
            'stroke="#999" stroke-dasharray="4,3" stroke-opacity="0.4" '
            'class="grid"/>'
        )
        lines.append(
            f'<text x="{x0 - 8}" y="{y + 4:.1f}" text-anchor="end" '
            f'font-size="11" class="ytick">{t:,.10g}</text>'
        )
    lines.append(
        f'<line x1="{x0}" y1="{y_of(ticks[0])}" x2="{x0}" '
        f'y2="{y_of(ticks[-1])}" stroke="black"/>'
    )
    lines.append(
        f'<line x1="{x0}" y1="{y_of(ticks[0])}" x2="{x1}" '
        f'y2="{y_of(ticks[0])}" stroke="black"/>'
    )


def bar_chart_svg(
    rows,
    x: str,
    y: str,
    title: str,
    top_n: int = 10,
    label_format: str = "{:,.0f}",
    max_label_len: int = 18,
) -> str:
    """Vertical bar chart with the reference's conventions: numeric
    coercion + null drop, sort descending, top-N, shortened rotated x
    labels, value labels above bars, dashed y grid
    (plots_from_spark_outputs.py:42-127)."""
    data = []
    for r in rows:
        d = r.asDict() if hasattr(r, "asDict") else dict(r)
        try:
            val = float(d[y])
        except (TypeError, ValueError):
            continue
        if math.isnan(val):
            continue
        data.append((shorten_label(d[x], max_label_len), val))
    data.sort(key=lambda kv: kv[1], reverse=True)
    data = data[:top_n]

    ticks = _nice_ticks(max((v for _, v in data), default=0.0))
    x0, x1 = _MARGIN["left"], _W - _MARGIN["right"]
    y0, y1 = _H - _MARGIN["bottom"], _MARGIN["top"]
    span = ticks[-1] or 1.0

    def y_of(v: float) -> float:
        return y0 - (v / span) * (y0 - y1)

    lines = _svg_open(title)
    _axes_and_grid(lines, ticks, y_of)

    n = max(len(data), 1)
    slot = (x1 - x0) / n
    bar_w = slot * 0.72
    for i, (label, val) in enumerate(data):
        bx = x0 + i * slot + (slot - bar_w) / 2
        by = y_of(val)
        lines.append(
            f'<rect x="{bx:.1f}" y="{by:.1f}" width="{bar_w:.1f}" '
            f'height="{y0 - by:.1f}" fill="#4477aa" class="bar"/>'
        )
        cx = bx + bar_w / 2
        lines.append(
            f'<text x="{cx:.1f}" y="{by - 5:.1f}" text-anchor="middle" '
            f'font-size="11" class="value">'
            f"{escape(label_format.format(val))}</text>"
        )
        lines.append(
            f'<text x="{cx:.1f}" y="{y0 + 12:.1f}" font-size="11" '
            f'text-anchor="end" class="xtick" '
            f'transform="rotate(-45 {cx:.1f} {y0 + 12:.1f})">'
            f"{escape(label)}</text>"
        )
    lines.append(
        f'<text x="{(x0 + x1) / 2}" y="{_H - 14}" text-anchor="middle" '
        f'font-size="13" class="xlabel">{escape(x)}</text>'
    )
    lines.append(
        f'<text x="20" y="{(y0 + y1) / 2}" text-anchor="middle" '
        f'font-size="13" class="ylabel" '
        f'transform="rotate(-90 20 {(y0 + y1) / 2})">{escape(y)}</text>'
    )
    lines.append("</svg>")
    return "\n".join(lines)


def scatter_chart_svg(
    rows,
    x: str,
    y: str,
    title: str,
    x_label: str | None = None,
    y_label: str | None = None,
) -> str:
    """Scatter with dashed grid and 0.5-alpha points — the reference's
    engagement-vs-spend view (integratedplots_query.py:16-43). Row
    filtering (e.g. spenders only) belongs to the caller's query, as in
    the reference."""
    pts = []
    for r in rows:
        d = r.asDict() if hasattr(r, "asDict") else dict(r)
        try:
            pts.append((float(d[x]), float(d[y])))
        except (TypeError, ValueError):
            continue
    xt = _nice_ticks(max((p[0] for p in pts), default=0.0))
    yt = _nice_ticks(max((p[1] for p in pts), default=0.0))
    x0, x1 = _MARGIN["left"], _W - _MARGIN["right"]
    y0, y1 = _H - _MARGIN["bottom"], _MARGIN["top"]
    xspan, yspan = xt[-1] or 1.0, yt[-1] or 1.0

    def sx(v: float) -> float:
        return x0 + (v / xspan) * (x1 - x0)

    def sy(v: float) -> float:
        return y0 - (v / yspan) * (y0 - y1)

    lines = _svg_open(title)
    _axes_and_grid(lines, yt, sy)
    for t in xt:
        lines.append(
            f'<line x1="{sx(t):.1f}" y1="{y0}" x2="{sx(t):.1f}" y2="{y1}" '
            'stroke="#999" stroke-dasharray="4,3" stroke-opacity="0.4" '
            'class="grid"/>'
        )
        lines.append(
            f'<text x="{sx(t):.1f}" y="{y0 + 16}" text-anchor="middle" '
            f'font-size="11" class="xtick">{t:,.10g}</text>'
        )
    for px, py in pts:
        lines.append(
            f'<circle cx="{sx(px):.1f}" cy="{sy(py):.1f}" r="4" '
            'fill="#4477aa" fill-opacity="0.5" class="point"/>'
        )
    lines.append(
        f'<text x="{(x0 + x1) / 2}" y="{_H - 14}" text-anchor="middle" '
        f'font-size="13" class="xlabel">{escape(x_label or x)}</text>'
    )
    lines.append(
        f'<text x="20" y="{(y0 + y1) / 2}" text-anchor="middle" '
        f'font-size="13" class="ylabel" '
        f'transform="rotate(-90 20 {(y0 + y1) / 2})">'
        f"{escape(y_label or y)}</text>"
    )
    lines.append("</svg>")
    return "\n".join(lines)


def save_chart(svg: str, path: str) -> None:
    with open(path, "w") as f:
        f.write(svg)
