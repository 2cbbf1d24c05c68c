"""Z-order layout (operators/layout.py): the skipping property itself.

Writes the same uniform 2-D relation twice — z-clustered vs
single-column-sorted — into 16 files each, reads back every file's
min/max envelope, and counts the files a single-column predicate could
skip. Z-order must skip most files on EITHER dimension; the
single-column sort skips only on its own."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from house_price_etl_pipeline_spark.operators.layout import zorder_key

N_ROWS = 4096
N_FILES = 16
DOMAIN = 256


def _envelopes(spark, path):
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        r = (spark.read.parquet(f)
             .agg(F.min("x"), F.max("x"), F.min("y"), F.max("y"))
             .collect()[0])
        out.append(tuple(r))
    return out


def _skippable(envs, col, lo, hi):
    """Files whose [min,max] on `col` cannot contain values in [lo,hi]."""
    idx = {"x": (0, 1), "y": (2, 3)}[col]
    return sum(1 for e in envs if e[idx[1]] < lo or e[idx[0]] > hi)


def test_zorder_write_skips_on_both_dimensions(spark, tmp_path):
    df = spark.range(N_ROWS).select(
        F.col("id"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(DOMAIN)).alias("x"),
        F.pmod(F.xxhash64(F.col("id") + 7_000_000), F.lit(DOMAIN))
        .alias("y"),
    )
    zpath, xpath = str(tmp_path / "zorder"), str(tmp_path / "xsort")
    (df.withColumn("zkey", zorder_key(F.col("x"), F.col("y"), bits=8))
       .repartitionByRange(N_FILES, "zkey")
       .write.mode("overwrite").parquet(zpath))
    df.repartitionByRange(N_FILES, "x").write.mode("overwrite").parquet(xpath)

    zenv, xenv = _envelopes(spark, zpath), _envelopes(spark, xpath)
    assert len(zenv) == N_FILES and len(xenv) == N_FILES

    # narrow y predicate: x-sorted layout can skip nothing (y is uniform
    # within every file); z-order confines y to ~quarter-tiles
    assert _skippable(xenv, "y", 100, 107) == 0
    assert _skippable(zenv, "y", 100, 107) >= N_FILES // 2
    # narrow x predicate: both skip; z-order still skips at least half
    assert _skippable(xenv, "x", 100, 107) >= N_FILES // 2
    assert _skippable(zenv, "x", 100, 107) >= N_FILES // 2


def test_zorder_key_is_morton_interleave(spark):
    rows = spark.createDataFrame(
        [(5, 3), (0, 0), (255, 0), (0, 255)], ["x", "y"]
    ).select(zorder_key(F.col("x"), F.col("y"), bits=8).alias("z")).collect()

    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert [r.z for r in rows] == [morton(5, 3), 0, morton(255, 0),
                                   morton(0, 255)]


def test_ivf_cell_partitioned_layout_prunes_probe_scan(spark, tmp_path):
    """The at-rest half of IVF ANN: vectors written partitionBy(cell)
    (cell = nearest coarse centroid) let an nprobe search read ONLY the
    probed cells' directories — partition pruning does the candidate
    selection before any row is read. At 100 TB this is the difference
    between scanning the vector corpus and scanning nprobe/cells of it."""
    from house_price_etl_pipeline_spark.operators.similarity import (
        IVF_CELLS, _cell_udf)

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = str(tmp_path / "ivf_layout")
    (e.withColumn("cell", _cell_udf()(F.col("embedding")))
     .write.partitionBy("cell").parquet(out))

    # layout check: one directory per observed cell
    dirs = {p.split("cell=")[1] for p in glob.glob(f"{out}/cell=*")}
    assert len(dirs) > 2

    probed = sorted(int(d) for d in dirs)[:2]
    reader = spark.read.parquet(out).filter(F.col("cell").isin(probed))
    plan = reader._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan.split(
        "PartitionFilters", 1)[1][:120]
    # the probe really reads only the two cells
    assert {r.cell for r in reader.select("cell").distinct().collect()} \
        == set(probed)
    n_all = e.count()
    n_probe = reader.count()
    assert 0 < n_probe < n_all
