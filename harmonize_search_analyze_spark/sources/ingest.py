"""Ingest sources (SURVEY.md §2.1).

- ``read_city_csv`` — S1: the reference's CSV scan contract
  (``Baltimore-notebook.ipynb:269-273``): header row, comma delimiter,
  ``inferSchema=False`` so every column starts as a string and the
  harmonization layer owns all typing decisions.
- ``read_jsonl`` / ``write_jsonl`` — newline-delimited JSON for
  document-corpus interchange (training-data pipelines).
- ``read_orc`` — the built-in columnar alternative.
- ``read_avro`` — S9: provisioned-but-unused in the reference
  (``infrastructure/jupyterspark.yaml:239``); Spark treats avro as an
  external module, so this is gated and raises a clear error when the
  runtime lacks ``spark-avro``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_city_csv(spark: SparkSession, path: str) -> DataFrame:
    """All-string CSV scan (S1). Multiline/quote handling left at Spark
    defaults, matching the reference's spark-csv configuration."""
    return spark.read.csv(path, header=True, inferSchema=False)


def read_jsonl(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    """Newline-delimited JSON scan. Pass an explicit schema at scale —
    schema inference reads the data twice."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan (S9). Spark ships avro as an external module
    (``spark-avro``); without it on the classpath this raises with guidance
    rather than a deep Py4J stack."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:  # AnalysisException: failed to find data source
        if "avro" in str(exc).lower():
            raise NotImplementedError(
                "the spark-avro module is not on this runtime's classpath; "
                "add org.apache.spark:spark-avro to spark.jars.packages, "
                "or point $SPARK_GRAFT_AVRO_JAR at a local spark-avro jar "
                "BEFORE the session starts (session.get_spark wires it "
                "into spark.jars)"
            ) from exc
        raise
