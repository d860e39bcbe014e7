"""Avro DATA-file source/sink (reference: the DataFile format enum admits
PARQUET | AVRO | ORC, spec/manifest.go:101-149; the reference never actually
reads or writes Avro data either — its scan assumes Parquet).

Spark has no bundled Avro datasource (spark-avro is an external package), so
this rides the engine's own pure-Python OCF serde (``avro.py``) through
Arrow-batched ``mapInPandas``: the write fans out one OCF file per partition
from the executors, the read parallelizes the file list and streams each
file's records back as pandas batches. Python-side per-row encode/decode is
the honest cost of the format here — Parquet stays the performance path, and
the scan planner treats that as the default; this exists so an Avro-format
ingest or legacy feed can land/extract without leaving the engine.

Types covered: the Spark primitives the engine's tables use — long/int,
double/float, string, boolean, binary, date, timestamp (µs).
"""

from __future__ import annotations

import os
import uuid
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_SPARK_TO_AVRO = {
    T.LongType: "long",
    T.IntegerType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.StringType: "string",
    T.BooleanType: "boolean",
    T.BinaryType: "bytes",
}


def _avro_schema(schema: T.StructType, name: str = "row") -> dict:
    fields = []
    for f in schema.fields:
        if isinstance(f.dataType, T.DateType):
            typ: object = {"type": "int", "logicalType": "date"}
        elif isinstance(f.dataType, T.TimestampType):
            typ = {"type": "long", "logicalType": "timestamp-micros"}
        else:
            prim = _SPARK_TO_AVRO.get(type(f.dataType))
            if prim is None:
                raise ValueError(f"avro data files: unsupported type {f.dataType}")
            typ = prim
        fields.append({"name": f.name, "type": ["null", typ]})
    return {"type": "record", "name": name, "fields": fields}


def _to_avro_cell(v, dt: T.DataType):
    import datetime as _dt

    import pandas as pd

    try:
        if v is None or pd.isna(v):  # pandas null markers: NaN / NaT / None
            return None
    except (TypeError, ValueError):  # arrays (bytes in object cols) — not null
        pass
    if isinstance(dt, T.DateType):
        return (v - _dt.date(1970, 1, 1)).days
    if isinstance(dt, T.TimestampType):
        epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return int((v - epoch).total_seconds() * 1_000_000)
    if isinstance(dt, (T.LongType, T.IntegerType)):
        return int(v)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return float(v)
    return v


def _from_avro_cell(v, dt: T.DataType):
    import datetime as _dt

    if v is None:
        return None
    if isinstance(dt, T.DateType):
        return _dt.date(1970, 1, 1) + _dt.timedelta(days=v)
    if isinstance(dt, T.TimestampType):
        return _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=v)
    return v


def write_avro_files(df: DataFrame, path: str) -> int:
    """Distributed OCF write: each partition lands one file under ``path``.
    Returns the number of files written."""
    from pyspark.sql import Row

    schema = df.schema
    avro = _avro_schema(schema)
    dtypes = [f.dataType for f in schema.fields]
    names = [f.name for f in schema.fields]
    os.makedirs(path, exist_ok=True)

    def sink(batches) -> Iterator:
        import pandas as pd

        from go_iceberg_spark.avro import write_ocf

        rows = []
        for pdf in batches:
            for tup in pdf.itertuples(index=False):
                rows.append({n: _to_avro_cell(getattr(tup, n), t)
                             for n, t in zip(names, dtypes)})
        if rows:
            fname = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
            write_ocf(fname, avro, rows)
            yield pd.DataFrame({"file": [fname], "n": [len(rows)]})

    out = df.mapInPandas(sink, "file string, n long").collect()
    return len(out)


def read_avro_files(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Distributed OCF read: parallelize the file list, each task decodes its
    files and yields Arrow batches with the requested schema."""
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".avro"))
    names = [f.name for f in schema.fields]
    dtypes = [f.dataType for f in schema.fields]
    file_df = spark.createDataFrame([(f,) for f in files], "path string").repartition(
        max(1, min(len(files), spark.sparkContext.defaultParallelism)))

    def source(batches) -> Iterator:
        import pandas as pd

        from go_iceberg_spark.avro import read_ocf

        for pdf in batches:
            for p in pdf["path"]:
                _, _, records = read_ocf(p)
                if not records:
                    continue
                yield pd.DataFrame({
                    n: [_from_avro_cell(r.get(n), t) for r in records]
                    for n, t in zip(names, dtypes)
                })

    return file_df.mapInPandas(source, schema)
