"""Harmonization operator library.

Re-expression of the reference's ETL helper library
(``notebooks/lib/harmonizeCrimeIncidents.py``) as pure
DataFrame -> DataFrame functions with explicit lineage capture. The reference
builds SQL strings with raw value interpolation (``mapValues``
``:285-296``) — injection-prone and untestable; here every transform is a
Column expression (SURVEY.md §4 anti-pattern #2 fixed, semantics preserved:
unmatched values PASS THROUGH unchanged, the CASE ... ELSE col END behavior).

A ``Harmonizer`` wraps one dataset and accumulates the ``varmap`` /
``varmapreverse`` lineage dicts the reference keeps
(``harmonizeCrimeIncidents.py:263-283``), which feed ``dict_varmapping`` in
the data dictionary.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_INVALID_NAME_CHARS = r"[ ,;{}()\n\t=/#&\-]"


def make_valid_variable_name(name: str) -> str:
    """Sanitize one column name (``harmonizeCrimeIncidents.py:323-329``):
    strip metastore-hostile characters, lowercase."""
    return re.sub(_INVALID_NAME_CHARS, "", name).lower()


@dataclass
class Harmonizer:
    """One dataset's harmonization pipeline with lineage bookkeeping."""

    df: DataFrame
    varmap: dict[str, str] = dc_field(default_factory=dict)        # new -> descr
    varmapreverse: dict[str, str] = dc_field(default_factory=dict)  # new -> old
    observations: dict = dc_field(default_factory=dict)            # name -> Observation

    # -- P1: mapVar (harmonizeCrimeIncidents.py:263-283) -------------------
    def map_var(self, oldvar: str, newvar: str, keep_orig: bool = False) -> "Harmonizer":
        """Rename/copy a column. When renaming onto the same name with
        ``keep_orig``, the original survives as ``<name>_orig``."""
        df = self.df
        if oldvar == newvar:
            if keep_orig:
                df = df.withColumn(f"{newvar}_orig", F.col(oldvar))
            self._record(newvar, oldvar)
            self.df = df
            return self
        df = df.withColumn(newvar, F.col(f"`{oldvar}`"))
        if not keep_orig:
            df = df.drop(oldvar)
        self._record(newvar, oldvar)
        self.df = df
        return self

    def _record(self, newvar: str, oldvar: str) -> None:
        self.varmap[newvar] = f"Source: {oldvar}."
        self.varmapreverse[newvar] = oldvar

    # -- P2: makeValidVariableNames ----------------------------------------
    def make_valid_variable_names(self) -> "Harmonizer":
        renames = {c: make_valid_variable_name(c) for c in self.df.columns}
        self.df = self.df.toDF(*renames.values())
        for old, new in renames.items():
            if old != new:
                self._record(new, old)
        return self

    # -- X7: mapValues (CASE ... ELSE passthrough) --------------------------
    def map_values(self, col: str, mapping: dict[str, str]) -> "Harmonizer":
        """Remap enum values; unmatched values pass through unchanged
        (the reference's CASE ELSE col END, ``harmonizeCrimeIncidents.py:292``).
        Built as a map-literal lookup + coalesce — one codegen'd expression,
        no SQL-string interpolation."""
        if not mapping:
            return self
        pairs: list[Column] = []
        for k, v in mapping.items():
            pairs.extend([F.lit(k), F.lit(v)])
        lookup = F.create_map(*pairs)
        self.df = self.df.withColumn(
            col, F.coalesce(lookup[F.col(col)], F.col(col))
        )
        prev = self.varmap.get(col, "")
        self.varmap[col] = (prev + f" Mapped {len(mapping)} values.").strip()
        return self

    # -- P8: setColDataTypes (metadata-driven casts) ------------------------
    def set_col_data_types(self, types: dict[str, str]) -> "Harmonizer":
        """Cast columns per a name->type map. The reference's version
        (``harmonizeCrimeIncidents.py:304-319``, with its dead line 305 bug)
        special-cased boolean->int; we cast boolean-typed targets to int 0/1."""
        df = self.df
        for c, t in types.items():
            if t == "boolean":
                df = df.withColumn(c, F.col(c).cast("boolean").cast("int"))
            else:
                df = df.withColumn(c, F.col(c).cast(t))
        self.df = df
        return self

    # -- derived-column helpers used by all three city notebooks ------------
    def derive_datetime(
        self,
        year: str = "year", month: str = "month", day: str = "day",
        hour: str = "hour", minute: str = "minute",
        out: str = "datetime",
    ) -> "Harmonizer":
        """datetime = concat(y-m-d, ' ', h:mi:00) cast to timestamp
        (``Baltimore-notebook.ipynb:652``). Non-padded parts are accepted the
        way Spark 2 accepted them — we normalize with lpad to be explicit."""
        df = self.df
        ts = F.concat(
            F.concat_ws(
                "-",
                F.col(year).cast("string"),
                F.lpad(F.col(month).cast("string"), 2, "0"),
                F.lpad(F.col(day).cast("string"), 2, "0"),
            ),
            F.lit(" "),
            F.concat_ws(
                ":",
                F.lpad(F.col(hour).cast("string"), 2, "0"),
                F.lpad(F.col(minute).cast("string"), 2, "0"),
                F.lit("00"),
            ),
        ).cast("timestamp")
        self.df = df.withColumn(out, ts)
        return self

    def derive_dayofweek(self, ts: str = "datetime", out: str = "dayofweek") -> "Harmonizer":
        """English day name via date_format(ts,'EEEE')
        (``Baltimore-notebook.ipynb:663``)."""
        self.df = self.df.withColumn(out, F.date_format(F.col(ts), "EEEE"))
        return self

    def derive_geolocation(
        self, lat: str = "latitude", lon: str = "longitude", out: str = "geolocation"
    ) -> "Harmonizer":
        """'lat,lon' string assembly (``Detroit-notebook.ipynb:654``)."""
        self.df = self.df.withColumn(
            out, F.concat(F.col(lat).cast("string"), F.lit(","), F.col(lon).cast("string"))
        )
        return self

    def filter_nonempty(self, col: str) -> "Harmonizer":
        """F1: drop rows with empty/absent value (length(col) > 0)."""
        self.df = self.df.where(F.length(F.col(col)) > 0)
        return self

    def filter_observed(self, predicate: Column, name: str) -> "Harmonizer":
        """F4 done right: rejected-row accounting WITHOUT extra count jobs.
        The reference brackets every filter with two ``df.count()`` actions
        (``Baltimore-notebook.ipynb:595-601`` — two full scans per filter);
        ``observe`` piggybacks both tallies on whichever action runs next.
        Read them from ``observations[name]`` after an action:
        ``{'rows_in': ..., 'rows_kept': ...}``."""
        from pyspark.sql import Observation

        obs = Observation(name)
        self.df = self.df.observe(
            obs,
            F.count(F.lit(1)).alias("rows_in"),
            F.sum(predicate.cast("long")).alias("rows_kept"),
        ).where(predicate)
        self.observations[name] = obs
        return self

    def filter_range_sanity(
        self, col: str, lo: float | None = None, hi: float | None = None
    ) -> "Harmonizer":
        """F2: numeric sanity bounds (the 99999-sentinel / wrong-sign drops,
        ``Detroit-notebook.ipynb:630-634``)."""
        df = self.df
        if lo is not None:
            df = df.where(F.col(col) > lo)
        if hi is not None:
            df = df.where(F.col(col) < hi)
        self.df = df
        return self

    def add_provenance(self, **lits: str) -> "Harmonizer":
        """lit-constant provenance columns (city, rawdatapath, ...) —
        P5 pattern (``Baltimore-notebook.ipynb:548``)."""
        df = self.df
        for name, value in lits.items():
            df = df.withColumn(name, F.lit(value))
        self.df = df
        return self

    def build_dictionary(self, meta: dict | None = None, **kwargs):
        """Profile this dataset into its data dictionary, folding the
        accumulated transform lineage into ``dict_varmapping`` (the
        reference passes its ``varmap`` dict to ``buildDataDict`` the same
        way, ``harmonizeCrimeIncidents.py:344-352``)."""
        from harmonize_search_analyze_spark.operators.profiler import (
            ColumnMeta,
            build_data_dict,
        )

        meta = dict(meta or {})
        for c in self.df.columns:
            m = meta.setdefault(c, ColumnMeta())
            if not m.varmapping and c in self.varmap:
                m.varmapping = self.varmap[c]
        return build_data_dict(self.df, meta, **kwargs)


# -- standalone datetime-part extraction (the multi-format regexes) ---------

DATE_MDY_RE = r"(\d+)/(\d+)/(\d+)"          # Baltimore CrimeDate m/d/yyyy
TIME_HMS_RE = r"(\d+):(\d+):(\d+)"          # 18:51:00
TIME_COMPACT_RE = r"(\d\d)(\d\d)"           # 1851
# LA combined: m/d/yyyy h:mm:ss AM|PM
DATETIME_AMPM_RE = r"(\d+)/(\d+)/(\d+) (\d+):(\d+):(\d+) (AM|PM)"


def extract_date_parts(
    df: DataFrame, src: str,
    year: str = "year", month: str = "month", day: str = "day",
) -> DataFrame:
    """m/d/yyyy -> int year/month/day (``Baltimore-notebook.ipynb:626-646``)."""
    return (
        df.withColumn(month, F.regexp_extract(F.col(src), DATE_MDY_RE, 1).cast("int"))
        .withColumn(day, F.regexp_extract(F.col(src), DATE_MDY_RE, 2).cast("int"))
        .withColumn(year, F.regexp_extract(F.col(src), DATE_MDY_RE, 3).cast("int"))
    )


def extract_time_parts(
    df: DataFrame, src: str, hour: str = "hour", minute: str = "minute"
) -> DataFrame:
    """Mixed '18:51:00' / '1851' time strings -> hour/minute ints, with the
    hour-24 -> 00 fix (``Baltimore-notebook.ipynb:637``)."""
    has_colon = F.col(src).contains(":")
    h = F.when(has_colon, F.regexp_extract(F.col(src), TIME_HMS_RE, 1)).otherwise(
        F.regexp_extract(F.col(src), TIME_COMPACT_RE, 1)
    )
    m = F.when(has_colon, F.regexp_extract(F.col(src), TIME_HMS_RE, 2)).otherwise(
        F.regexp_extract(F.col(src), TIME_COMPACT_RE, 2)
    )
    h = F.when(h == "24", F.lit("00")).otherwise(h)
    return df.withColumn(hour, h.cast("int")).withColumn(minute, m.cast("int"))


def ampm_to_24h(hour_col: Column, ampm_col: Column) -> Column:
    """12h -> 24h (``LosAngeles-notebook.ipynb:695-699`` SQL IF), with the
    12AM->0 / 12PM->12 edge handled (the reference's IF only added 12 for PM;
    we pin the correct conversion and test it)."""
    h = hour_col.cast("int")
    return (
        F.when((ampm_col == "AM") & (h == 12), F.lit(0))
        .when((ampm_col == "PM") & (h != 12), h + 12)
        .otherwise(h)
    )
