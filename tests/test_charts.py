"""SVG chart renderer (charts.py) — structural checks via XML parsing:
the reference's chart conventions (sort-desc top-N bars, shortened
labels, value labels, dashed grid, spender-filtered scatter) must
survive in the dependency-free renderer. No Spark needed: charts
consume collected rows."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from big_data_analytics_final_project_spark.charts import (
    bar_chart_svg,
    scatter_chart_svg,
    shorten_label,
)

NS = "{http://www.w3.org/2000/svg}"


def _by_class(svg: str, cls: str):
    root = ET.fromstring(svg)
    return [e for e in root.iter() if e.get("class") == cls]


def test_bar_chart_sorts_desc_tops_and_labels():
    rows = [{"cat": f"c{i}", "rev": float(i * 10)} for i in range(15)]
    svg = bar_chart_svg(rows, "cat", "rev", "T", top_n=10)
    bars = _by_class(svg, "bar")
    assert len(bars) == 10
    heights = [float(b.get("height")) for b in bars]
    assert heights == sorted(heights, reverse=True)  # sorted desc
    values = [e.text for e in _by_class(svg, "value")]
    assert values[0] == "140"  # top value labeled, reference format
    assert len(_by_class(svg, "grid")) >= 3  # dashed y grid present


def test_bar_chart_drops_non_numeric_and_shortens():
    rows = [
        {"cat": "x" * 40, "rev": 5.0},
        {"cat": "ok", "rev": "not-a-number"},
        {"cat": "nan", "rev": float("nan")},
    ]
    svg = bar_chart_svg(rows, "cat", "rev", "T", max_label_len=18)
    assert len(_by_class(svg, "bar")) == 1
    xticks = [e.text for e in _by_class(svg, "xtick")]
    assert xticks == ["x" * 18 + "..."]
    assert shorten_label("ab", 18) == "ab"


def test_bar_chart_escapes_and_is_deterministic():
    rows = [{"cat": "<&>", "rev": 1.0}]
    svg = bar_chart_svg(rows, "cat", "rev", 'T<"&">')
    ET.fromstring(svg)  # parses despite hostile labels
    assert svg == bar_chart_svg(rows, "cat", "rev", 'T<"&">')


def test_scatter_points_and_axis_labels():
    rows = [{"s": float(i), "d": float(i * i)} for i in range(20)]
    svg = scatter_chart_svg(
        rows, "s", "d", "T", x_label="Sessions", y_label="Spent"
    )
    pts = _by_class(svg, "point")
    assert len(pts) == 20
    assert all(p.get("fill-opacity") == "0.5" for p in pts)
    labels = {e.text for e in _by_class(svg, "xlabel") + _by_class(svg, "ylabel")}
    assert labels == {"Sessions", "Spent"}


def test_empty_input_still_renders():
    for svg in (
        bar_chart_svg([], "a", "b", "empty"),
        scatter_chart_svg([], "a", "b", "empty"),
    ):
        root = ET.fromstring(svg)
        assert root.tag == f"{NS}svg"
