"""Cross-micro-batch state: split the events table into several files and
process them one file per trigger, so keyed dedup state must carry across
batches (the single-file availableNow path only ever sees one batch)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def split_events_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_split"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .repartition(4)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def test_dedup_state_spans_batches(spark, sf_dir, split_events_dir):
    schema = spark.read.parquet(split_events_dir).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .load(split_events_dir)
        .select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
    )
    name = f"dedup_batches_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    try:
        q.awaitTermination(120)
        n_batches = len(q.recentProgress)
    finally:
        q.stop()
    assert n_batches >= 2, "expected multiple micro-batches"
    got = {tuple(r) for r in spark.table(name).collect()}
    want = {
        tuple(r)
        for r in spark.read.parquet(split_events_dir)
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert got == want  # no dup emitted twice across batches, none lost
