"""Kibana saved-object loader e2e: parse the REFERENCE's actual export
(`notebooks/kibana-content/kibana-exported-visualizations.json`) and verify
the data-driven panel set produces exactly the results of the
hand-transcribed `crime_dashboard` panel dict it replaces."""

from __future__ import annotations

import os

import pytest

from harmonize_search_analyze_spark.operators.dashboards import (
    crime_dashboard,
    split_geolocation,
)
from harmonize_search_analyze_spark.operators.kibana import (
    dashboard_from_export,
    dashboard_panel_ids,
    panel_builder,
    panel_name,
    panels_from_export,
    parse_saved_objects,
    visualizations,
)

REF_EXPORT = (
    "/root/reference/notebooks/kibana-content/"
    "kibana-exported-visualizations.json"
)

needs_ref = pytest.mark.skipif(
    not os.path.exists(REF_EXPORT), reason="reference export not present"
)


@pytest.fixture(scope="module")
def export_text():
    with open(REF_EXPORT) as f:
        return f.read()


@pytest.fixture(scope="module")
def harmonized(spark):
    rows = [
        ("Assault", "Wednesday", 18, "baltimore", "Baltimore.html",
         "39.2880,-76.6200"),
        ("Theft", "Wednesday", 18, "baltimore", "Baltimore.html",
         "39.3000,-76.6100"),
        ("Assault", "Thursday", 9, "baltimore", "Baltimore.html",
         "39.2500,-76.7000"),
        ("Assault", "Wednesday", 18, "detroit", "Detroit.html",
         "42.40,-83.10"),
        ("Burglary", "Thursday", 0, "detroit", "Detroit.html",
         "42.35,-83.05"),
        ("Assault", "Friday", 13, "detroit", "Detroit.html",
         "42.30,-83.00"),
    ]
    return spark.createDataFrame(
        rows,
        ["description", "dayofweek", "hour", "city", "notebookhtml",
         "geolocation"],
    )


@needs_ref
def test_parse_reference_export(export_text):
    objs = parse_saved_objects(export_text)
    types = sorted(o["_type"] for o in objs)
    assert types.count("visualization") == 5
    assert "dashboard" in types and "index-pattern" in types
    vizzes = visualizations(objs)
    assert set(vizzes) == {
        "Description", "Day-slash-Hour", "DatasetTable", "City",
        "IncidentMap",
    }
    # titles decode from visState; the index pattern from the search source
    assert vizzes["Day-slash-Hour"].title == "Day/Hour"
    assert vizzes["Description"].index_pattern == "*harmonized*"
    # dashboard panel order follows panelIndex
    assert dashboard_panel_ids(objs) == [
        "IncidentMap", "DatasetTable", "City", "Description",
        "Day-slash-Hour",
    ]
    # IncidentMap saved autoPrecision=true, precision=2
    geo = [a for a in vizzes["IncidentMap"].aggs
           if a["type"] == "geohash_grid"][0]["params"]
    assert geo["autoPrecision"] is True and geo["precision"] == 2


@needs_ref
def test_panel_names_match_hand_coded_set(export_text):
    panels = panels_from_export(export_text)
    assert set(panels) == {
        "incident_map", "dataset_table", "city", "description", "day_hour"
    }


@needs_ref
def test_loader_reproduces_hand_coded_dashboard(spark, export_text,
                                                harmonized):
    """The five data-driven panels equal the five hand-coded panels
    row-for-row on the same harmonized frame."""
    hand = crime_dashboard(harmonized)
    loaded = dashboard_from_export(
        harmonized, export_text, geo_split=split_geolocation
    )
    name_map = {
        "description": "description_pie",
        "day_hour": "day_hour_pie",
        "dataset_table": "dataset_table",
        "city": "city_pie",
        "incident_map": "incident_map",
    }
    for loaded_name, hand_name in name_map.items():
        got = [tuple(r) for r in loaded[loaded_name].collect()]
        want = [tuple(r) for r in hand[hand_name].collect()]
        assert got == want, f"{loaded_name} != {hand_name}"


@needs_ref
def test_auto_precision_zoom_ladder(spark, export_text, harmonized):
    """autoPrecision panels honor a supplied map zoom via the Kibana
    zoom->precision ladder instead of the saved precision."""
    from harmonize_search_analyze_spark.functions.geohash import (
        auto_precision,
    )

    zoom = 10
    panels = panels_from_export(
        export_text, geo_split=split_geolocation, zoom=zoom
    )
    geo = panels["incident_map"](harmonized).collect()
    p = auto_precision(zoom)
    assert p > 2  # zoom 10 is finer than the saved precision
    assert all(len(r["geohash"]) == p for r in geo)


def test_panel_builder_rejects_unsupported():
    from harmonize_search_analyze_spark.operators.kibana import VizSpec

    spec = VizSpec(
        id="x", title="x", viz_type="pie",
        aggs=[{"id": "1", "type": "avg", "schema": "metric", "params": {}}],
    )
    with pytest.raises(ValueError):
        panel_builder(spec)


def test_panel_name_slugs():
    assert panel_name("DatasetTable") == "dataset_table"
    assert panel_name("Day/Hour") == "day_hour"
    assert panel_name("IncidentMap") == "incident_map"
    assert panel_name("City") == "city"
