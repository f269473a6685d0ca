"""Pluggable sinks — the reference's terminal stage, behind a seam.

The datafeed's terminal stage is batched async upserts into Cassandra
(SURVEY §1.1, §3.1). This environment has no Cassandra server and no
network (SURVEY §0.1), so the writer is a seam: the Cassandra
implementation carries the real connector configuration and the
parquet/memory implementations keep every pipeline testable offline.
Nothing upstream knows which sink it writes to — exactly how the
facade stays runnable both here and on a real cluster.
"""

from __future__ import annotations

import abc

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def cql_type(dt: T.DataType) -> str:
    """Spark type → CQL column type for sink DDL generation."""
    if isinstance(dt, T.ArrayType):
        return f"list<frozen<{cql_type(dt.elementType)}>>"
    if isinstance(dt, T.StructType):
        inner = ", ".join(f"{f.name} {cql_type(f.dataType)}" for f in dt.fields)
        return f"frozen<tuple<{inner}>>"
    mapping = {
        T.LongType: "bigint",
        T.IntegerType: "int",
        T.DoubleType: "double",
        T.FloatType: "float",
        T.StringType: "text",
        T.BooleanType: "boolean",
        T.DateType: "date",
        T.TimestampType: "timestamp",
        T.TimestampNTZType: "timestamp",
        T.BinaryType: "blob",
    }
    for spark_t, cql in mapping.items():
        if isinstance(dt, spark_t):
            return cql
    raise TypeError(f"no CQL mapping for Spark type {dt}")


class Sink(abc.ABC):
    """Idempotent table writer: ``write(df, table, keys)`` must be
    safe to re-run for the same data (the reference re-ingests heights
    on reorg/restart; Cassandra PK upsert gives idempotency natively,
    file sinks emulate it with overwrite-by-partition)."""

    @abc.abstractmethod
    def write(self, df: DataFrame, table: str, keys: list[str]) -> None: ...


class ParquetSink(Sink):
    """Partitioned parquet writer (the offline/test default).

    ``partition_col`` should be a low-cardinality derivative of the
    upsert key (height bucket, date) — overwriting a partition then
    re-writes exactly one bounded directory, which is the idempotent
    re-ingest story at file level.
    """

    def __init__(self, base_dir: str, partition_col: str | None = None):
        self.base_dir = base_dir
        self.partition_col = partition_col

    def write(self, df: DataFrame, table: str, keys: list[str]) -> None:
        w = df.write.mode("overwrite")
        if self.partition_col and self.partition_col in df.columns:
            w = w.partitionBy(self.partition_col)
        w.parquet(f"{self.base_dir}/{table}")


class CassandraSink(Sink):
    """Cassandra upsert via the Spark Cassandra Connector data source.

    Append mode IS upsert in Cassandra (last-write-wins by PK), which
    matches the reference's semantics. The connector handles
    token-aware routing and batching; we only declare table/keyspace.

    No Cassandra exists in this environment — construction succeeds
    (so configuration is unit-testable) but ``write`` raises unless
    the connector jar + a reachable cluster are actually present.
    """

    FORMAT = "org.apache.spark.sql.cassandra"

    def __init__(self, keyspace: str, host: str = "localhost"):
        self.keyspace = keyspace
        self.host = host

    def options_for(self, table: str) -> dict[str, str]:
        return {"keyspace": self.keyspace, "table": table}

    def keyspace_ddl(self, replication: int = 3) -> str:
        """CQL for the keyspace — the reference's schema-setup stage."""
        return (
            f"CREATE KEYSPACE IF NOT EXISTS {self.keyspace} WITH replication = "
            f"{{'class': 'SimpleStrategy', 'replication_factor': {replication}}}"
        )

    def table_ddl(self, df: DataFrame, table: str, keys: list[str]) -> str:
        """CQL CREATE TABLE derived from the DataFrame's schema, with
        the upsert keys as the primary key (first key = partition key,
        rest clustering — the co-partitioned-write contract)."""
        if not keys:
            raise ValueError("Cassandra tables need at least one key column")
        cols = ",\n  ".join(
            f"{f.name} {cql_type(f.dataType)}" for f in df.schema.fields
        )
        pk = ", ".join(keys)
        return (
            f"CREATE TABLE IF NOT EXISTS {self.keyspace}.{table} (\n"
            f"  {cols},\n  PRIMARY KEY ({pk})\n)"
        )

    def write(self, df: DataFrame, table: str, keys: list[str]) -> None:
        spark = df.sparkSession
        spark.conf.set("spark.cassandra.connection.host", self.host)
        (
            df.write.format(self.FORMAT)
            .options(**self.options_for(table))
            .mode("append")  # C* append == PK upsert
            .save()
        )


class MemorySink(Sink):
    """Collects written tables on the driver — tests only (a driver-
    side collect is precisely what production sinks never do)."""

    def __init__(self):
        self.tables: dict[str, list] = {}

    def write(self, df: DataFrame, table: str, keys: list[str]) -> None:
        self.tables[table] = df.collect()
