"""Python DataSource API connector: partition planning, determinism,
Arrow-batch reads (sources/pydatasource.py)."""

from __future__ import annotations

from house_price_etl_pipeline_spark.sources.pydatasource import (
    read_synthetic_events,
)


def test_partition_planning_respected(spark):
    df = read_synthetic_events(spark, rows=1000, partitions=5)
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 1000


def test_rows_identical_for_any_partition_count(spark):
    """Every column is a pure function of the row id, so re-planning with
    a different partition count must yield the SAME multiset of rows —
    the retry/elasticity guarantee a distributed source needs."""
    a = sorted(map(tuple, read_synthetic_events(spark, 2000, 3).collect()))
    b = sorted(map(tuple, read_synthetic_events(spark, 2000, 7).collect()))
    assert a == b


def test_schema_and_value_ranges(spark):
    df = read_synthetic_events(spark, rows=500, partitions=2)
    assert [f.name for f in df.schema.fields] == [
        "event_id", "ts_s", "user_id", "event_type", "value"]
    row = df.selectExpr(
        "min(user_id) as lo_u", "max(user_id) as hi_u",
        "min(value) as lo_v", "max(value) as hi_v").first()
    assert 0 <= row.lo_u and row.hi_u < 150
    assert 0.0 <= row.lo_v and row.hi_v < 100.0


def test_json_audit_writer_two_phase_commit(spark, tmp_path):
    """Writer side of the DataSource API: shards land via rename-on-commit
    with a manifest whose counts reconcile to the input — and no staging
    files survive."""
    import json
    import os

    from house_price_etl_pipeline_spark.sources.pydatasource import (
        register_jsonaudit_sink)

    register_jsonaudit_sink(spark)
    out = str(tmp_path / "audit_out")
    df = read_synthetic_events(spark, rows=300, partitions=3)
    df.write.format("jsonaudit").option("path", out).mode("append").save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert sum(manifest.values()) == 300
    files = sorted(os.listdir(out))
    assert not any(f.startswith("_staging") for f in files)
    n_lines = sum(
        1 for f in files if f.endswith(".jsonl")
        for _ in open(os.path.join(out, f)))
    assert n_lines == 300
    # round-trip: the shards are plain JSON-lines Spark can read back
    back = spark.read.schema(df.schema).json(os.path.join(out, "*.jsonl"))
    assert back.count() == 300


def test_json_audit_overwrite_sweeps_stale_shards(spark, tmp_path):
    """Overwrite after a LARGER previous write must leave no stale
    part-NNNNN shards (or orphaned staging files) behind — a naive
    *.jsonl glob read must see exactly the new rows."""
    import json
    import os

    from house_price_etl_pipeline_spark.sources.pydatasource import (
        register_jsonaudit_sink)

    register_jsonaudit_sink(spark)
    out = str(tmp_path / "audit_overwrite")
    big = read_synthetic_events(spark, rows=400, partitions=4)
    big.write.format("jsonaudit").option("path", out).mode("append").save()
    # plant an orphan from a hypothetical crashed attempt
    open(os.path.join(out, "_staging_deadbeef.tmp"), "w").write("{}\n")

    small = read_synthetic_events(spark, rows=100, partitions=2)
    small.write.format("jsonaudit").option("path", out).mode("overwrite").save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert sum(manifest.values()) == 100
    files = sorted(os.listdir(out))
    assert not any(f.startswith("_staging") for f in files)
    shards = [f for f in files if f.endswith(".jsonl")]
    assert sorted(shards) == sorted(manifest)  # no stale part files
    back = spark.read.schema(small.schema).json(os.path.join(out, "*.jsonl"))
    assert back.count() == 100


def test_stream_reader_drains_in_micro_batches_equal_to_batch(spark, tmp_path):
    """The connector's DataSourceStreamReader: offsets advance
    rows_per_batch ids per trigger, executors generate each range, and
    the fully-drained stream equals the batch read — same generator,
    same determinism, now under Spark's streaming offset contract."""
    import time

    from house_price_etl_pipeline_spark.sources.pydatasource import (
        read_synthetic_events, register_synthetic_source)

    register_synthetic_source(spark)
    n = 1000
    stream = (spark.readStream.format("synthetic_events")
              .option("rows", str(n)).option("rows_per_batch", "256")
              .option("partitions", "4").load())
    assert stream.isStreaming
    q = (stream.writeStream.format("memory").queryName("pysrc_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        deadline = time.time() + 120
        while spark.table("pysrc_stream").count() < n:
            assert time.time() < deadline, "stream did not drain in time"
            time.sleep(0.5)
        # ≥ ceil(1000/256) = 4 micro-batches committed. lastProgress
        # can LAG the commit that completed the drain (the row-count
        # poll races the progress reporter) — poll it to the same
        # deadline instead of asserting the instantaneous value
        while q.lastProgress is None or q.lastProgress["batchId"] < 3:
            assert time.time() < deadline, \
                f"progress stuck at {q.lastProgress}"
            time.sleep(0.2)
    finally:
        q.stop()
    got = spark.table("pysrc_stream")
    assert got.count() == n
    batch = read_synthetic_events(spark, rows=n, partitions=4)
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_stream_writer_replayed_batch_is_noop(tmp_path):
    """JsonAuditStreamWriter.commit must skip a batch id already in the
    stream manifest (replay after failure) and clean the replay's
    staged shards — per-batch exactly-once without engine support."""
    import json
    import os

    from house_price_etl_pipeline_spark.sources.pydatasource import (
        JsonAuditStreamWriter, _ShardCommit)

    root = str(tmp_path / "sink")
    os.makedirs(os.path.join(root, "_staging"))
    w = JsonAuditStreamWriter({"path": root})

    def stage(content):
        p = os.path.join(root, "_staging", f"{content}.tmp")
        with open(p, "w") as f:
            f.write('{"x": 1}\n')
        return _ShardCommit(p, 1)

    w.commit([stage("a")], batchId=0)
    manifest = json.load(open(os.path.join(root, "_STREAM_MANIFEST.json")))
    assert manifest["batches"] == {"0": 1}
    files = sorted(os.listdir(os.path.join(root, "batch-0")))

    replay = stage("b")  # a re-delivered batch 0 with fresh staging
    w.commit([replay], batchId=0)
    manifest = json.load(open(os.path.join(root, "_STREAM_MANIFEST.json")))
    assert manifest["batches"] == {"0": 1}          # unchanged
    assert sorted(os.listdir(os.path.join(root, "batch-0"))) == files
    assert not os.path.exists(replay.shard)          # staging swept


def test_stream_reader_resumes_from_checkpoint_across_restarts(spark, tmp_path):
    """Offset checkpointing across QUERY RESTARTS: an availableNow run
    latches exactly one offset window (measured engine behavior for
    this reader), so after it stops mid-stream, a second query on the
    SAME checkpoint must resume from the committed offset and deliver
    the remaining rows exactly once — total = every generated row, no
    duplicates. This is the replayability contract the reader's
    partitions(start, end) claims."""
    import os

    from pyspark.sql import functions as F

    from house_price_etl_pipeline_spark.sources.pydatasource import (
        register_synthetic_source)

    register_synthetic_source(spark)
    ck = str(tmp_path / "ck")
    seen = []

    def stream():
        return (spark.readStream.format("synthetic_events")
                .option("rows", "3000").option("rows_per_batch", "1000")
                .option("partitions", "2").load())

    q1 = (stream().writeStream
          .foreachBatch(lambda df, bid: seen.append(
              (1, bid, sorted(r.event_id for r in df.collect()))))
          .option("checkpointLocation", ck)
          .trigger(availableNow=True).start())
    q1.awaitTermination()
    first_ids = [i for (_, _, ids) in seen for i in ids]
    assert 0 < len(first_ids) < 3000  # stopped mid-stream

    q2 = (stream().writeStream
          .foreachBatch(lambda df, bid: seen.append(
              (2, bid, sorted(r.event_id for r in df.collect()))))
          .option("checkpointLocation", ck).start())
    q2.processAllAvailable()
    q2.stop()

    all_ids = sorted(i for (_, _, ids) in seen for i in ids)
    assert all_ids == list(range(3000))  # exactly once, no gaps, no dupes


def test_python_source_filter_pushdown(spark):
    """Spark 4.1 Python DataSource filter pushdown: event_id range
    predicates narrow the PLANNED partitions (pruned rows are never
    generated), unsupported filters are handed back to Spark, and a
    contradictory range plans an empty scan — results identical to
    post-scan filtering."""
    from pyspark.sql.datasource import (
        GreaterThanOrEqual, LessThan, StringContains)

    from house_price_etl_pipeline_spark.sources.pydatasource import (
        SyntheticEventsReader, register_synthetic_source)

    # unit: the reader consumes range filters and narrows its plan
    r = SyntheticEventsReader({"rows": "100000", "partitions": "4",
                               "pushdown": "true"})
    rest = list(r.pushFilters([GreaterThanOrEqual(("event_id",), 90000),
                               LessThan(("event_id",), 90010),
                               StringContains(("event_type",), "cl")]))
    assert rest == [StringContains(("event_type",), "cl")]
    parts = r.partitions()
    assert parts[0].start == 90000 and parts[-1].end == 90010
    assert sum(p.end - p.start for p in parts) == 10

    # contradiction → empty scan, not an error
    r2 = SyntheticEventsReader({"rows": "100", "pushdown": "true"})
    list(r2.pushFilters([GreaterThanOrEqual(("event_id",), 50),
                         LessThan(("event_id",), 10)]))
    assert sum(p.end - p.start for p in r2.partitions()) == 0

    # end-to-end: pushed plan returns exactly the filtered rows
    # (pushdown contract: one load() per query)
    register_synthetic_source(spark)
    df = (spark.read.format("synthetic_events")
          .option("rows", "100000").option("partitions", "4")
          .option("pushdown", "true").load()
          .filter("event_id >= 90000 AND event_id < 90010")
          .filter("event_type like '%c%'"))
    got = [r.event_id for r in df.orderBy("event_id").collect()]
    full = (spark.read.format("synthetic_events")
            .option("rows", "100000").load())
    want = [r.event_id for r in full
            .filter("event_id >= 90000 AND event_id < 90010")
            .filter("event_type like '%c%'")
            .orderBy("event_id").collect()]
    assert got == want and len(got) > 0

    # default-on leak safety (VERDICT r4 item 9): the library contract
    # is a FRESH load() per query — under it, pushdown (now default on)
    # never leaks one query's pushed range into another
    from house_price_etl_pipeline_spark.sources.pydatasource import (
        read_synthetic_events)

    assert read_synthetic_events(spark, rows=1000, partitions=2) \
        .filter("event_id >= 300").count() == 700
    assert read_synthetic_events(spark, rows=1000, partitions=2) \
        .count() == 1000
    assert read_synthetic_events(spark, rows=1000, partitions=2) \
        .filter("event_id < 10").count() == 10

    # reuse-safety escape hatch: pushdown OFF keeps a HELD DataFrame
    # exactly correct across differently-filtered queries (Spark
    # memoizes the planned scan per load(); see pushFilters docstring)
    ev = (spark.read.format("synthetic_events")
          .option("rows", "1000").option("partitions", "2")
          .option("pushdown", "false").load())
    assert ev.filter("event_id >= 300").count() == 700
    assert ev.count() == 1000
    assert ev.filter("event_id < 10").count() == 10


def test_json_audit_append_accumulates(spark, tmp_path):
    """Append mode must ACCUMULATE (the reference's WRITE_APPEND): a
    second append used to rename its shards over the first write's
    part-{i} names and rewrite the manifest — reproduced as 100+50
    rows leaving only 50 on disk (review r9)."""
    import glob
    import json
    import os

    from house_price_etl_pipeline_spark.sources.pydatasource import \
        register_jsonaudit_sink

    register_jsonaudit_sink(spark)
    out = str(tmp_path / "audit_acc")
    spark.range(100).selectExpr("id AS k").coalesce(2) \
        .write.format("jsonaudit").option("path", out).mode("append").save()
    spark.range(100, 150).selectExpr("id AS k").coalesce(2) \
        .write.format("jsonaudit").option("path", out).mode("append").save()
    rows = []
    for f in glob.glob(os.path.join(out, "part-*.jsonl")):
        with open(f) as fh:
            rows += [json.loads(line)["k"] for line in fh]
    assert sorted(rows) == list(range(150))
    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    assert sum(manifest.values()) == 150
    assert len(manifest) == 4          # 2 shards per write, both retained


def test_stream_writer_complete_mode_replaces_batches(spark, tmp_path):
    """outputMode('complete') passes overwrite=True to the stream
    writer: each committed batch must REPLACE prior results, not stack
    beside them (review r9 — the flag was dropped and a complete-mode
    reader saw every group duplicated once per batch)."""
    import glob
    import json
    import os

    from house_price_etl_pipeline_spark.sources.pydatasource import (
        register_jsonaudit_sink, register_synthetic_source)

    register_synthetic_source(spark)
    register_jsonaudit_sink(spark)
    out = str(tmp_path / "audit_complete")
    stream = (spark.readStream.format("synthetic_events")
              .option("rows", "400").option("rows_per_batch", "100")
              .option("partitions", "2").load())
    agg = stream.groupBy("event_type").count()
    q = (agg.writeStream.outputMode("complete").format("jsonaudit")
         .option("path", out)
         .option("checkpointLocation", os.path.join(out, "_ckpt"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    with open(os.path.join(out, "_STREAM_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    assert len(manifest["batches"]) == 1      # only the FINAL batch
    batch_dirs = glob.glob(os.path.join(out, "batch-*"))
    assert len(batch_dirs) == 1               # stale dirs pruned
    rows = []
    for f in glob.glob(os.path.join(batch_dirs[0], "*.jsonl")):
        with open(f) as fh:
            rows += [json.loads(line) for line in fh]
    # the final complete-mode table == the batch aggregate of all rows
    assert sum(r["count"] for r in rows) == 400


def test_json_audit_concurrent_appends_keep_both_manifests(tmp_path):
    """ADVICE r9: two concurrent append commits to one path must both
    land in _MANIFEST.json — the read-modify-write runs under the
    O_EXCL manifest lock, so neither writer's shard entries are
    dropped by the other's publish."""
    import json
    import os
    import threading

    from house_price_etl_pipeline_spark.sources.pydatasource import (
        JsonAuditWriter, _ShardCommit)

    path = str(tmp_path / "audit")
    os.makedirs(path)

    def staged(tag, rows):
        shard = os.path.join(path, f"_staging_{tag}.tmp")
        with open(shard, "w") as f:
            for r in range(rows):
                f.write(json.dumps({"tag": tag, "r": r}) + "\n")
        return _ShardCommit(shard, rows)

    barrier = threading.Barrier(2)
    errors = []

    def committer(tag, rows):
        try:
            w = JsonAuditWriter({"path": path}, overwrite=False)
            msgs = [staged(f"{tag}{i}", rows) for i in range(3)]
            barrier.wait()
            w.commit(msgs)
        except Exception as exc:
            errors.append(exc)

    threads = [threading.Thread(target=committer, args=("a", 5)),
               threading.Thread(target=committer, args=("b", 7))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    with open(os.path.join(path, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert len(manifest) == 6                      # 3 shards per writer
    assert sorted(manifest.values()) == [5, 5, 5, 7, 7, 7]
    # every manifest entry exists on disk and the lock is released
    for shard in manifest:
        assert os.path.exists(os.path.join(path, shard))
    assert not os.path.exists(os.path.join(path, "_MANIFEST.lock"))


def test_json_audit_stale_manifest_lock_taken_over(tmp_path):
    """A crashed committer's orphaned lock older than the staging GC
    age is broken instead of deadlocking every future commit."""
    import json
    import os
    import time

    from house_price_etl_pipeline_spark.sources.pydatasource import (
        STAGING_GC_AGE_S, JsonAuditWriter, _ShardCommit)

    path = str(tmp_path / "audit")
    os.makedirs(path)
    lock = os.path.join(path, "_MANIFEST.lock")
    with open(lock, "w"):
        pass
    old = time.time() - STAGING_GC_AGE_S - 60
    os.utime(lock, (old, old))
    shard = os.path.join(path, "_staging_x.tmp")
    with open(shard, "w") as f:
        f.write(json.dumps({"r": 1}) + "\n")
    JsonAuditWriter({"path": path}, overwrite=False).commit(
        [_ShardCommit(shard, 1)])
    with open(os.path.join(path, "_MANIFEST.json")) as f:
        assert sum(json.load(f).values()) == 1
    assert not os.path.exists(lock)


def test_json_audit_lost_lock_aborts_and_spares_peer_lock(tmp_path):
    """A committer whose lock was broken by the staleness takeover
    (its fd's file is no longer the lock path) must NOT publish the
    manifest and must NOT unlink the new holder's lock — either would
    reintroduce the lost-shard race the lock exists to prevent
    (ADVICE r10)."""
    import json
    import os

    import pytest as _pytest

    from house_price_etl_pipeline_spark.sources.pydatasource import (
        JsonAuditWriter, _ShardCommit)

    path = str(tmp_path / "audit")
    os.makedirs(path)
    lock = os.path.join(path, "_MANIFEST.lock")
    w = JsonAuditWriter({"path": path}, overwrite=False)
    # simulate: we acquired, stalled, a peer broke our lock and created
    # its own — our fd now points at an unlinked inode
    stale_fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.unlink(lock)
    with open(lock, "w") as f:
        f.write("peer")
    peer_ino = os.stat(lock).st_ino
    shard = os.path.join(path, "_staging_y.tmp")
    with open(shard, "w") as f:
        f.write(json.dumps({"r": 1}) + "\n")
    orig = JsonAuditWriter._acquire_manifest_lock
    JsonAuditWriter._acquire_manifest_lock = lambda self: stale_fd
    try:
        with _pytest.raises(RuntimeError, match="lock lost"):
            w.commit([_ShardCommit(shard, 1)])
    finally:
        JsonAuditWriter._acquire_manifest_lock = orig
    assert os.path.exists(lock)                 # peer's lock survives
    assert os.stat(lock).st_ino == peer_ino
    assert not os.path.exists(os.path.join(path, "_MANIFEST.json"))
