"""Table-maintenance evidence: zero-shuffle small-file compaction and
z-order layout pruning measured at the parquet-footer level (exactly what
an Iceberg manifest or a parquet reader's row-group pruner consults).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from isimip_qa_spark.functions.zorder import write_zordered, zorder_key_expr
from isimip_qa_spark.plans.maintenance import _data_files, compact_table


def test_compact_small_files(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(20000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 113).alias("v")
    )
    df.repartition(32).write.parquet(path)
    before = _data_files(path)
    assert len(before) == 32

    stats = compact_table(spark, path, target_bytes=1 << 20, small_bytes=1 << 20)
    after = _data_files(path)
    assert stats.n_files_before == 32 and stats.n_rewritten == 32
    assert len(after) == stats.n_files_after < 8  # ~120KB total vs 1MB target
    # data unchanged, bit for bit
    got = spark.read.parquet(path).orderBy("k").collect()
    assert [(r.k, r.v) for r in got] == [(i, i * 7 % 113) for i in range(20000)]


def test_compact_leaves_big_files_alone(spark, tmp_path):
    path = str(tmp_path / "t2")
    spark.range(1000).withColumnRenamed("id", "k").coalesce(1).write.parquet(path)
    big = [f for f, _ in _data_files(path)]
    assert len(big) == 1
    # add small files alongside
    spark.range(1000, 1200).withColumnRenamed("id", "k").repartition(
        8
    ).write.parquet(path, mode="append")
    stats = compact_table(spark, path, target_bytes=1 << 20, small_bytes=2000)
    # the one >=2KB file kept its exact path; the 8 tiny ones merged
    assert stats.n_untouched >= 1
    kept = {f for f, _ in _data_files(path)}
    untouched_big = [f for f in big if f in kept]
    assert untouched_big == big
    assert {r.k for r in spark.read.parquet(path).collect()} == set(range(1200))


def test_compaction_read_is_exchange_free(spark, tmp_path):
    """The compaction plan must be scan -> write: split packing does the
    merging, never a shuffle."""
    path = str(tmp_path / "t3")
    spark.range(5000).repartition(16).write.parquet(path)
    files = [f for f, _ in _data_files(path)]
    saved = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
        plan = (
            spark.read.parquet(*files)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", saved)
    assert "Exchange" not in plan


def _file_boxes(path: str, cols: tuple[str, str]):
    """(min, max) per column per data file, from parquet footer stats —
    the manifest-level view a pruner uses."""
    boxes = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet") or name.startswith(("_", ".")):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for c in cols:
                st = md.row_group(rg).column(idx[c]).statistics
                lo[c] = st.min if lo[c] is None else min(lo[c], st.min)
                hi[c] = st.max if hi[c] is None else max(hi[c], st.max)
        boxes.append({c: (lo[c], hi[c]) for c in cols})
    return boxes


def _files_intersecting(boxes, query: dict[str, tuple[int, int]]) -> int:
    n = 0
    for b in boxes:
        if all(b[c][0] <= hi and b[c][1] >= lo for c, (lo, hi) in query.items()):
            n += 1
    return n


def test_zorder_layout_prunes_both_dims(spark, tmp_path):
    """256x256 grid written (a) range-partitioned on x only, (b) z-ordered
    on (x, y), 16 files each. A y-box query's candidate file set — files
    whose footer min/max intersect the box — must be the FULL set under
    the x layout and a strict subset under z; an (x, y) box must prune
    under z too."""
    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y")
    )
    px = str(tmp_path / "by_x")
    pz = str(tmp_path / "by_z")
    grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(px)
    write_zordered(grid, pz, "x", "y", n_files=16)

    bx = _file_boxes(px, ("x", "y"))
    bz = _file_boxes(pz, ("x", "y"))
    assert len(bx) == len(bz) == 16

    ybox = {"y": (0, 31)}
    assert _files_intersecting(bx, ybox) == 16  # x layout: no help on y
    assert _files_intersecting(bz, ybox) <= 8  # z layout: prunes on y

    xybox = {"x": (0, 31), "y": (0, 31)}
    assert _files_intersecting(bz, xybox) <= 4
    # and the z files still carry useful x bounds (prunes x-only too)
    assert _files_intersecting(bz, {"x": (0, 31)}) <= 8


def test_zorder_key_saturates_not_aliases(spark):
    """Values past the per-dim width must land at the TOP of the key
    range (saturate), never wrap onto small keys — aliasing would smear
    file min/max boxes across the whole dimension."""
    from pyspark.sql import Row

    rows = spark.createDataFrame(
        [Row(x=65535, y=0), Row(x=65536, y=0), Row(x=10**9, y=0), Row(x=0, y=0)]
    ).select(zorder_key_expr(F.col("x"), F.col("y")).alias("z")).collect()
    top, over, huge, zero = (r.z for r in rows)
    assert over == top and huge == top  # saturation, not wraparound
    assert zero == 0 and top > 0


def test_zorder_key_locality(spark):
    """Morton property: the key of (x, y) and (x+1, y) differ only in
    x-bits — neighbours in either dim stay within a bounded key distance
    when the other dim is fixed (sanity on the bit interleave)."""
    rows = (
        spark.range(16)
        .select(
            zorder_key_expr(F.col("id"), F.lit(0)).alias("zx"),
            zorder_key_expr(F.lit(0), F.col("id")).alias("zy"),
            zorder_key_expr(F.col("id"), F.col("id")).alias("zd"),
        )
        .collect()
    )
    for i, r in enumerate(rows):
        # x occupies even bits, y odd bits, diagonal is their union
        assert r.zx == sum(((i >> b) & 1) << (2 * b) for b in range(4))
        assert r.zy == sum(((i >> b) & 1) << (2 * b + 1) for b in range(4))
        assert r.zd == r.zx | r.zy
