"""Kibana saved-object loader: the reference's dashboard, DATA-driven.

The reference ships its five visualizations as an Elasticsearch scan dump
of the ``.kibana`` index (concatenated hit objects, one per saved object:
``notebooks/kibana-content/kibana-exported-visualizations.json:1-9``) and
composes them into ``IncidentDashboard`` via ``panelsJSON``; the webapp
renders them with a shared filter context (``services/webapp/src/
views.js:97-115``). ``operators/dashboards.py::crime_dashboard`` holds a
hand-transcribed copy of that panel set; this module parses the ACTUAL
export format into panel specs and executable panels, so a user can point
the engine at their own Kibana export instead of editing Python.

Supported visState agg shapes (everything the reference's export uses):

- metric ``count`` + one ``terms`` bucket        -> ``terms`` top-k
- metric ``count`` + two ``terms`` segments/buckets
  (pie ring / table)                             -> ``nested_terms`` /
                                                    ``terms_multi``
- metric ``count`` + ``geohash_grid``            -> ``geohash_grid``
  (``autoPrecision: true`` honored via the zoom->precision ladder when a
  ``zoom`` is supplied; the saved ``precision`` otherwise)

Everything is metadata-sized driver work: parsing a JSON export and
building DataFrame plans. Execution stays in ``dashboard()`` — one shared
filtered scan, one hash agg per panel.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame

from harmonize_search_analyze_spark.operators.aggregations import (
    dashboard,
    geohash_grid,
    nested_terms,
    terms,
    terms_multi,
)


def parse_saved_objects(text: str) -> list[dict]:
    """Parse a Kibana export: a concatenation of JSON hit objects (the
    reference writes one ``{"_index": ".kibana", ...}`` per saved object,
    back to back — not a JSON array, not JSONL). Tolerates whitespace,
    commas, and array brackets between objects, so a wrapped ``[...]``
    export parses too."""
    dec = json.JSONDecoder()
    objs, i, n = [], 0, len(text)
    while i < n:
        while i < n and text[i] in " \n\r\t,[]":
            i += 1
        if i >= n:
            break
        obj, i = dec.raw_decode(text, i)
        objs.append(obj)
    return objs


@dataclass
class VizSpec:
    """One saved visualization, decoded: id/title/type plus the agg list
    from ``visState`` and the index pattern from the search source."""

    id: str
    title: str
    viz_type: str
    aggs: list[dict] = field(default_factory=list)
    index_pattern: str | None = None

    @property
    def bucket_aggs(self) -> list[dict]:
        return [a for a in self.aggs if a.get("schema") in ("segment", "bucket")]


def visualizations(objs: list[dict]) -> dict[str, VizSpec]:
    """Extract every ``_type == "visualization"`` saved object into a
    VizSpec keyed by saved-object id."""
    out: dict[str, VizSpec] = {}
    for o in objs:
        if o.get("_type") != "visualization":
            continue
        src = o.get("_source", {})
        vis = json.loads(src["visState"])
        pattern = None
        meta = src.get("kibanaSavedObjectMeta", {}).get("searchSourceJSON")
        if meta:
            pattern = json.loads(meta).get("index")
        out[o["_id"]] = VizSpec(
            id=o["_id"],
            title=vis.get("title", o["_id"]),
            viz_type=vis.get("type", ""),
            aggs=vis.get("aggs", []),
            index_pattern=pattern,
        )
    return out


def dashboard_panel_ids(
    objs: list[dict], dashboard_id: str | None = None
) -> list[str]:
    """Visualization ids on a dashboard, in ``panelIndex`` order (the
    render order the webapp uses). With no ``dashboard_id``, the first
    dashboard object in the export wins."""
    for o in objs:
        if o.get("_type") != "dashboard":
            continue
        if dashboard_id is not None and o.get("_id") != dashboard_id:
            continue
        panels = json.loads(o["_source"]["panelsJSON"])
        panels.sort(key=lambda p: p.get("panelIndex", 0))
        return [p["id"] for p in panels if p.get("type") == "visualization"]
    if dashboard_id is not None:
        raise KeyError(f"dashboard {dashboard_id!r} not in export")
    return []


def panel_name(title: str) -> str:
    """Saved-object title -> snake_case panel key (``Day/Hour`` ->
    ``day_hour``, ``DatasetTable`` -> ``dataset_table``)."""
    s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", title)
    s = re.sub(r"[^0-9a-zA-Z]+", "_", s)
    return s.strip("_").lower()


def panel_builder(
    spec: VizSpec,
    *,
    geo_split: Callable[[DataFrame], DataFrame] | None = None,
    geo_lat: str = "_lat",
    geo_lon: str = "_lon",
    zoom: int | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """Compile one VizSpec's agg list into a panel callable.

    ``geo_split`` pre-processes the frame for geo panels (the harmonized
    schema stores ``"lat,lon"`` strings; ``dashboards.split_geolocation``
    is the matching splitter). ``zoom`` engages Kibana's autoPrecision
    ladder for geohash panels that saved ``autoPrecision: true``."""
    buckets = spec.bucket_aggs
    metrics = [a for a in spec.aggs if a.get("schema") == "metric"]
    if not metrics or metrics[0].get("type") != "count":
        raise ValueError(
            f"{spec.id}: only the count metric is supported, got {metrics}"
        )
    if len(buckets) == 1 and buckets[0]["type"] == "geohash_grid":
        p = buckets[0]["params"]
        precision = int(p.get("precision", 2))
        auto = bool(p.get("autoPrecision", False))
        eff_zoom = zoom if (auto and zoom is not None) else None

        def geo_panel(d: DataFrame) -> DataFrame:
            if geo_split is not None:
                d = geo_split(d)
            return geohash_grid(
                d, geo_lat, geo_lon, precision=precision, zoom=eff_zoom
            )

        return geo_panel
    if len(buckets) == 1 and buckets[0]["type"] == "terms":
        p = buckets[0]["params"]
        return lambda d: terms(d, p["field"], k=int(p.get("size", 10)))
    if len(buckets) == 2 and all(b["type"] == "terms" for b in buckets):
        p1, p2 = buckets[0]["params"], buckets[1]["params"]
        if spec.viz_type == "table":
            # table viz: flat multi-field terms, one size for the table
            return lambda d: terms_multi(
                d, [p1["field"], p2["field"]], k=int(p1.get("size", 20))
            )
        return lambda d: nested_terms(
            d,
            p1["field"],
            p2["field"],
            outer_k=int(p1.get("size", 10)),
            inner_k=int(p2.get("size", 10)),
        )
    raise ValueError(
        f"{spec.id}: unsupported agg shape "
        f"{[(b['type'], b.get('schema')) for b in buckets]}"
    )


def panels_from_export(
    text: str,
    *,
    dashboard_id: str | None = None,
    geo_split: Callable[[DataFrame], DataFrame] | None = None,
    zoom: int | None = None,
) -> dict[str, Callable[[DataFrame], DataFrame]]:
    """Export text -> {panel_name: callable}, restricted to (and ordered
    by) the dashboard's panel list when the export contains one."""
    objs = parse_saved_objects(text)
    vizzes = visualizations(objs)
    ids = dashboard_panel_ids(objs, dashboard_id) or list(vizzes)
    panels = {}
    for vid in ids:
        spec = vizzes.get(vid)
        if spec is None:
            raise KeyError(
                f"dashboard references visualization {vid!r}, which is "
                f"not in the export (have: {sorted(vizzes)})"
            )
        name = panel_name(spec.title)
        if name in panels:
            raise ValueError(
                f"visualization titles {spec.title!r} and an earlier one "
                f"both slug to panel name {name!r} — rename one, or build "
                "panels per-spec with panel_builder()"
            )
        panels[name] = panel_builder(spec, geo_split=geo_split, zoom=zoom)
    return panels


def dashboard_from_export(
    frame: DataFrame,
    export_text: str,
    *,
    dashboard_id: str | None = None,
    query=None,
    time_field: str | None = None,
    time_from=None,
    time_to=None,
    geo_split: Callable[[DataFrame], DataFrame] | None = None,
    zoom: int | None = None,
) -> dict[str, DataFrame]:
    """End to end: parse a Kibana export, build its dashboard's panels,
    run them over one shared filter context (``dashboard()`` semantics —
    a single cached filtered scan feeding every panel)."""
    panels = panels_from_export(
        export_text, dashboard_id=dashboard_id, geo_split=geo_split, zoom=zoom
    )
    return dashboard(
        frame,
        panels,
        query=query,
        time_field=time_field,
        time_from=time_from,
        time_to=time_to,
    )
