"""Custom connector via the Spark 4 Python DataSource API: a deterministic,
partitioned synthetic-events source (`format("synthetic_events")`).

This is the engine's source-extensibility story (SURVEY.md §2A S1-S5
generalized): a connector the DataFrame reader plans like any other —
partitions become tasks, options flow from `.option()`, the schema is
declared up front. The generator is seeded per partition, so the dataset is
reproducible at any parallelism (the same property the testdata relies on).

Register once per session:
    from finegourmet_spark.sources.python_datasource import register
    register(spark)
    df = (spark.read.format("synthetic_events")
          .option("rows", 10_000).option("partitions", 8).load())
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


class _Partition(InputPartition):
    def __init__(self, index: int, start: int, end: int):
        self.index = index
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        per = -(-self.n_rows // self.n_parts)  # ceil
        return [
            _Partition(i, i * per, min((i + 1) * per, self.n_rows))
            for i in range(self.n_parts)
            if i * per < self.n_rows
        ]

    def read(self, partition: _Partition):
        # executor-side generator — deterministic in (seed, row index) alone,
        # so any partitioning yields the same dataset
        import datetime as dt
        import random

        for i in range(partition.start, partition.end):
            rng = random.Random((self.seed << 32) ^ i)
            ts = dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i * 37 % 86_400)
            yield (
                i,
                ts,
                rng.randrange(1, 1 + max(2, self.n_rows // 20)),
                EVENT_TYPES[rng.randrange(len(EVENT_TYPES))],
                round(rng.uniform(0.5, 200.0), 2),
            )


class SyntheticEventsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticEventsReader(self.options)


@dataclass
class _StagedFile(WriterCommitMessage):
    staged: str = ""
    final: str = ""


class JsonLinesWriter(DataSourceWriter):
    """Sink half of the connector API, genuinely two-phase: tasks stage
    their partition to a hidden ``.staging-*`` name and report it in the
    commit message; only the driver-side commit() renames staged files to
    their final names, and abort() deletes them — so retried/speculative or
    failed tasks never leave visible partial output (readers also skip
    dot-files by convention)."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        final = f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl"
        staged = os.path.join(self.path, f".staging-{final}")
        with open(staged, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
        return _StagedFile(staged=staged, final=os.path.join(self.path, final))

    def commit(self, messages):
        import os

        for m in messages:
            if m and m.staged:
                os.rename(m.staged, m.final)

    def abort(self, messages):
        import os

        for m in messages:
            if m and m.staged and os.path.exists(m.staged):
                os.remove(m.staged)


class JsonLinesSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonlines_sink"

    def writer(self, schema: StructType, overwrite: bool) -> JsonLinesWriter:
        return JsonLinesWriter(self.options)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(SyntheticEventsSource)
    spark.dataSource.register(JsonLinesSink)
