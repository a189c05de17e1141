"""Bucketed co-located join: pre-bucketing both fact tables on the join
key lets the sort-merge join run with ZERO exchange — the technique that
turns the biggest recurring shuffle of a 100 TB deployment (fact-fact
join) into a local merge. Asserted on the physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_assignment2_spark.plans.audit import explain_formatted, operators
from big_data_assignment2_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    """Write orders and lineitem bucketed by the join key into a
    session-scoped warehouse location."""
    base = str(tmp_path_factory.mktemp("warehouse"))
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", f"{base}/{name}_bucketed")
            .saveAsTable(f"{name}_bucketed")
        )
    yield
    for name in ("orders", "lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_bucketed")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    orders = spark.table("orders_bucketed")
    li = spark.table("lineitem_bucketed")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = explain_formatted(joined)
    assert any("Join" in o for o in operators(joined)), plan
    # co-located: neither join input is re-shuffled on its key (the only
    # Exchange in the plan is the small aggregate's, AFTER the join)
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan


def test_bucketed_equals_unbucketed(spark, sf_dir, warehouse):
    got = {
        tuple(r)
        for r in spark.table("lineitem_bucketed")
        .join(
            spark.table("orders_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {
        tuple(r)
        for r in load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_range_clustered_files_are_disjoint(spark, sf_dir):
    """The range-clustered lineitem layout must actually cluster: every
    output file covers a shipdate interval disjoint from the others
    (parquet footer min/max), which is what lets a range predicate prune
    to the overlapping files. Also asserts the read-back predicate
    reaches the scan as PushedFilters."""
    import glob

    import pyarrow.parquet as pq

    from big_data_assignment2_spark.plans.audit import explain_formatted
    from big_data_assignment2_spark.sources.partitioned_sink import (
        range_clustered_roundtrip,
        write_lineitem_range_clustered,
    )

    path = write_lineitem_range_clustered(spark, sf_dir)
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "l_shipdate"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            spans.append((min(mins), max(maxs)))
    assert len(spans) > 1, "expected multiple range-clustered files"
    spans.sort()
    for (_, prev_max), (next_min, _) in zip(spans, spans[1:]):
        # range partition boundaries assign equal keys to one side, so
        # consecutive files may only touch at a boundary, never overlap
        assert prev_max <= next_min, spans

    plan = explain_formatted(range_clustered_roundtrip(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan


def test_zorder_files_are_2d_local(spark, sf_dir):
    """Morton-curve clustering must bound BOTH key ranges within each
    file -- the property 1-D clustering cannot give (sorting on partkey
    leaves every file spanning the full suppkey range). Asserted from
    the parquet footers: the median per-file span in EACH dimension is
    well under the global span, and the registered 2-D box predicate
    prunes to a strict subset of the files."""
    import glob

    import pyarrow.parquet as pq

    from big_data_assignment2_spark.sources.partitioned_sink import (
        _zorder_box,
        write_lineitem_zordered,
        zorder_clustered_roundtrip,
    )

    path = write_lineitem_zordered(spark, sf_dir)

    def _boxes(col_a: str, col_b: str) -> list[tuple[int, int, int, int]]:
        boxes = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            stats: dict[str, list[int]] = {col_a: [], col_b: []}
            for rg in range(md.num_row_groups):
                for i in range(md.num_columns):
                    c = md.row_group(rg).column(i)
                    if c.path_in_schema in stats:
                        stats[c.path_in_schema] += [c.statistics.min, c.statistics.max]
            if stats[col_a]:
                boxes.append(
                    (
                        min(stats[col_a]),
                        max(stats[col_a]),
                        min(stats[col_b]),
                        max(stats[col_b]),
                    )
                )
        return boxes

    boxes = _boxes("l_partkey", "l_suppkey")
    assert len(boxes) > 4, "expected many z-clustered files"
    p_glob = (min(b[0] for b in boxes), max(b[1] for b in boxes))
    s_glob = (min(b[2] for b in boxes), max(b[3] for b in boxes))
    p_spans = sorted(b[1] - b[0] for b in boxes)
    s_spans = sorted(b[3] - b[2] for b in boxes)
    # median file covers a strict sub-range in BOTH dimensions
    assert p_spans[len(p_spans) // 2] <= (p_glob[1] - p_glob[0]) * 0.6, p_spans
    assert s_spans[len(s_spans) // 2] <= (s_glob[1] - s_glob[0]) * 0.6, s_spans

    plo, phi, slo, shi = _zorder_box(spark, sf_dir)
    hit = [
        b for b in boxes if not (b[1] < plo or b[0] >= phi or b[3] < slo or b[2] >= shi)
    ]
    assert len(hit) < len(boxes), "2-D box predicate pruned nothing"

    plan = explain_formatted(zorder_clustered_roundtrip(spark, sf_dir))
    assert "PushedFilters" in plan and "l_partkey" in plan and "l_suppkey" in plan


def test_hilbert_curve_exhaustive_properties(spark):
    """The Column-ladder Hilbert index must BE a Hilbert curve, checked
    exhaustively over all 2^(2*HILBERT_BITS) grid cells: (1) bijection
    onto [0, n*n) and (2) continuity -- consecutive curve positions are
    grid-adjacent (|dx| + |dy| == 1), the property that distinguishes it
    from the Morton interleave (whose quadrant seams jump diagonally
    across the grid) and that makes contiguous curve ranges cover tight
    2-D boxes."""
    from pyspark.sql import Window

    from big_data_assignment2_spark.sources.partitioned_sink import (
        HILBERT_BITS,
        _with_hilbert,
    )

    n = 1 << HILBERT_BITS
    grid = spark.range(n * n).select(
        (F.col("id") / n).cast("long").alias("x"), (F.col("id") % n).alias("y")
    )
    h = _with_hilbert(grid, F.col("x"), F.col("y"), "_h")
    lo, hi, nd = h.agg(
        F.min("_h"), F.max("_h"), F.count_distinct("_h")
    ).collect()[0]
    assert (lo, hi, nd) == (0, n * n - 1, n * n)  # bijection
    w = Window.orderBy("_h")
    jumps = (
        h.select(
            (
                F.abs(F.col("x") - F.lag("x").over(w))
                + F.abs(F.col("y") - F.lag("y").over(w))
            ).alias("step")
        )
        .where(F.col("step") != 1)
        .count()
    )
    assert jumps == 0  # continuity: every curve step moves one cell


def test_hilbert_files_are_2d_local(spark, sf_dir):
    """Hilbert clustering must bound BOTH key ranges within each file
    (same footer-stats assertion as the Morton layout), and the
    registered 2-D box predicate must prune to a strict file subset."""
    import glob

    import pyarrow.parquet as pq

    from big_data_assignment2_spark.sources.partitioned_sink import (
        _hilbert_box,
        hilbert_clustered_roundtrip,
        write_lineitem_hilbert,
    )

    path = write_lineitem_hilbert(spark, sf_dir)
    boxes = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        stats: dict[str, list[int]] = {"l_partkey": [], "l_suppkey": []}
        for rg in range(md.num_row_groups):
            for i in range(md.num_columns):
                c = md.row_group(rg).column(i)
                if c.path_in_schema in stats:
                    stats[c.path_in_schema] += [c.statistics.min, c.statistics.max]
        if stats["l_partkey"]:
            boxes.append(
                (
                    min(stats["l_partkey"]),
                    max(stats["l_partkey"]),
                    min(stats["l_suppkey"]),
                    max(stats["l_suppkey"]),
                )
            )
    assert len(boxes) > 4, "expected many hilbert-clustered files"
    p_glob = (min(b[0] for b in boxes), max(b[1] for b in boxes))
    s_glob = (min(b[2] for b in boxes), max(b[3] for b in boxes))
    p_spans = sorted(b[1] - b[0] for b in boxes)
    s_spans = sorted(b[3] - b[2] for b in boxes)
    assert p_spans[len(p_spans) // 2] <= (p_glob[1] - p_glob[0]) * 0.6, p_spans
    assert s_spans[len(s_spans) // 2] <= (s_glob[1] - s_glob[0]) * 0.6, s_spans

    plo, phi, slo, shi = _hilbert_box(spark, sf_dir)
    hit = [
        b for b in boxes if not (b[1] < plo or b[0] >= phi or b[3] < slo or b[2] >= shi)
    ]
    assert len(hit) < len(boxes), "2-D box predicate pruned nothing"

    plan = explain_formatted(hilbert_clustered_roundtrip(spark, sf_dir))
    assert "PushedFilters" in plan and "l_partkey" in plan and "l_suppkey" in plan


def test_secondary_index_skips_files_in_both_steps(spark, sf_dir):
    """Both halves of the index lookup must be able to skip files on
    parquet footer stats alone: the index probe (custkey-clustered) and
    the primary point fetch (orderkey-clustered). Asserted by replaying
    the min/max skip arithmetic the reader performs, plus the pushed
    filters on the fetch plan."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from big_data_assignment2_spark.sources.secondary_index import (
        build_orders_secondary_index,
        secondary_index_lookup,
    )

    primary, index = build_orders_secondary_index(spark, sf_dir)
    out = secondary_index_lookup(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 1
    target = rows[0]["o_custkey"]
    keys = sorted(r["o_orderkey"] for r in rows)

    def _ranges(path: str, col: str) -> list[tuple[int, int]]:
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            vals = []
            for rg in range(md.num_row_groups):
                for i in range(md.num_columns):
                    c = md.row_group(rg).column(i)
                    if c.path_in_schema == col:
                        vals += [c.statistics.min, c.statistics.max]
            if vals:
                spans.append((min(vals), max(vals)))
        return spans

    idx_spans = _ranges(index, "o_custkey")
    assert len(idx_spans) > 1
    idx_hit = [s for s in idx_spans if s[0] <= target <= s[1]]
    assert len(idx_hit) < len(idx_spans), "index probe pruned nothing"

    prim_spans = _ranges(primary, "o_orderkey")
    assert len(prim_spans) > 2
    prim_hit = [s for s in prim_spans if any(s[0] <= k <= s[1] for k in keys)]
    assert len(prim_hit) < len(prim_spans), "primary fetch pruned nothing"

    plan = explain_formatted(
        spark.read.parquet(primary).where(F.col("o_orderkey").isin(keys))
    )
    assert "PushedFilters" in plan and "In(o_orderkey" in plan


def test_bloom_filter_skips_where_stats_cannot(spark, sf_dir):
    """The bloom layout must show exactly the division of labor the
    docstring claims: (1) every file carries a bloom on o_orderkey and
    none on other columns; (2) min/max stats are USELESS for key point
    lookups on this date-clustered layout (every file's key range
    contains the probed keys); (3) the blooms, read back through the
    public parquet-mr API, report 'definitely absent' for every row
    group except where each key really lives -- the skip decision the
    reader makes for the pushed IN-list. Membership is probed through
    the Binary overload over the 8-byte little-endian plain encoding
    (identical bytes, hence identical xxhash, to the writer's
    hash(long) path; py4j cannot reliably pick the primitive-long
    overload from Python ints)."""
    import glob
    import struct

    from pyspark.sql import functions as F

    from big_data_assignment2_spark.sources.partitioned_sink import (
        parquet_bloom_skipping,
        write_orders_bloom,
    )

    path = write_orders_bloom(spark, sf_dir)
    out = parquet_bloom_skipping(spark, sf_dir)
    keys = sorted(r["o_orderkey"] for r in out.collect())
    assert len(keys) > 1

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    files = sorted(glob.glob(f"{path}/*.parquet"))
    assert len(files) > 2
    stats_hits = {k: 0 for k in keys}
    bloom_hits = {k: 0 for k in keys}
    n_groups = 0
    for f in files:
        infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            jvm.org.apache.hadoop.fs.Path(f), conf
        )
        r = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
        try:
            blocks = r.getRowGroups()
            for bi in range(blocks.size()):
                block = blocks.get(bi)
                n_groups += 1
                cols = block.getColumns()
                cc = None
                for ci in range(cols.size()):
                    c = cols.get(ci)
                    dot = c.getPath().toDotString()
                    if dot == "o_orderkey":
                        cc = c
                        assert c.getBloomFilterOffset() >= 0, f
                    elif dot == "o_custkey":
                        assert c.getBloomFilterOffset() == -1, f
                st = cc.getStatistics()
                lo, hi = st.genericGetMin(), st.genericGetMax()
                bf = r.getBloomFilterDataReader(block).readBloomFilter(cc)
                for k in keys:
                    if lo <= k <= hi:
                        stats_hits[k] += 1
                    payload = jvm.org.apache.parquet.io.api.Binary.fromConstantByteArray(
                        struct.pack("<q", k)
                    )
                    if bf.findHash(bf.hash(payload)):
                        bloom_hits[k] += 1
        finally:
            r.close()
    assert n_groups > 2
    for k in keys:
        # stats: the key range of (nearly) every row group contains k
        assert stats_hits[k] > n_groups // 2, (k, stats_hits[k], n_groups)
        # bloom: at least one possibly-present (it IS present somewhere),
        # and most row groups are definitively skipped
        assert 1 <= bloom_hits[k] <= n_groups // 2, (k, bloom_hits[k], n_groups)

    plan = explain_formatted(
        spark.read.parquet(path).where(F.col("o_orderkey").isin(keys))
    )
    assert "PushedFilters" in plan and "In(o_orderkey" in plan


def test_small_files_compaction_collapses_files(spark, sf_dir):
    """Compaction must reduce the debris to ceil(bytes/target) files and
    change nothing about the content."""
    import glob
    import math
    import os

    from big_data_assignment2_spark.sources.catalog import load_events
    from big_data_assignment2_spark.sources.partitioned_sink import (
        COMPACT_TARGET_BYTES,
        ensure_compacted_debris,
    )

    path = ensure_compacted_debris(spark, sf_dir)
    files = glob.glob(f"{path}/*.parquet")
    total = sum(os.path.getsize(f) for f in files)
    want = max(1, math.ceil(total / COMPACT_TARGET_BYTES))
    # post-compaction listing: file count equals the byte-derived target
    # (the pre-compaction debris count is DEBRIS_FILES=64)
    assert len(files) == want, (len(files), want)
    got = {tuple(r) for r in spark.read.parquet(path).collect()}
    ref = {tuple(r) for r in load_events(spark, sf_dir).collect()}
    assert got == ref


def test_string_bloom_skips_on_binary_hash_path(spark, sf_dir):
    """String-key twin of the long-bloom replay: every file carries a
    bloom on o_ref (plain-encoded by the dictionary opt-out), stats
    cannot prune the date-clustered layout for ref point lookups, and
    the blooms -- probed with Binary.fromString, the exact bytes the
    writer hashed -- definitively skip most row groups per key."""
    import glob

    from big_data_assignment2_spark.sources.partitioned_sink import (
        parquet_bloom_skipping_str,
        write_orders_bloom_str,
    )

    path = write_orders_bloom_str(spark, sf_dir)
    refs = sorted(r["o_ref"] for r in parquet_bloom_skipping_str(spark, sf_dir).collect())
    assert len(refs) > 1

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    files = sorted(glob.glob(f"{path}/*.parquet"))
    assert len(files) > 2
    stats_hits = {k: 0 for k in refs}
    bloom_hits = {k: 0 for k in refs}
    n_groups = 0
    for f in files:
        infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            jvm.org.apache.hadoop.fs.Path(f), conf
        )
        r = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
        try:
            blocks = r.getRowGroups()
            for bi in range(blocks.size()):
                block = blocks.get(bi)
                n_groups += 1
                cols = block.getColumns()
                cc = None
                for ci in range(cols.size()):
                    c = cols.get(ci)
                    if c.getPath().toDotString() == "o_ref":
                        cc = c
                        assert c.getBloomFilterOffset() >= 0, f
                st = cc.getStatistics()
                lo = st.genericGetMin().toStringUsingUTF8()
                hi = st.genericGetMax().toStringUsingUTF8()
                bf = r.getBloomFilterDataReader(block).readBloomFilter(cc)
                for k in refs:
                    if lo <= k <= hi:
                        stats_hits[k] += 1
                    payload = jvm.org.apache.parquet.io.api.Binary.fromString(k)
                    if bf.findHash(bf.hash(payload)):
                        bloom_hits[k] += 1
        finally:
            r.close()
    assert n_groups > 2
    for k in refs:
        # zero-padded refs order like orderkeys: uncorrelated with the
        # date layout, so (nearly) every row group's range contains k
        assert stats_hits[k] > n_groups // 2, (k, stats_hits[k], n_groups)
        assert 1 <= bloom_hits[k] <= n_groups // 2, (k, bloom_hits[k], n_groups)
