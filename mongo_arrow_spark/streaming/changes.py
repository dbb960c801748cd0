"""Change streams: MongoDB's ``watch()`` surface, Structured-Streaming-native.

The reference delegates change streams wholesale to the server
(`collection.watch()` returns a server cursor of change events; the
reference's role is only to hand the cursor to the caller — see
SURVEY §2.E "streaming"). Here the change log is a growing directory of
JSON-lines event files — the shape every CDC system (Debezium, Mongo
oplog tailers, Delta CDF) ultimately lands on — and ``watch`` is a
`readStream` over it, so watermarks, stateful operators, and sinks all
compose downstream.

Event shape (the public change-event document, one level flattened):

    _id            bigint   -- resume token: monotone per-event sequence
    operationType  string   -- insert | update | replace | delete
    clusterTime    timestamp
    documentKey    bigint   -- the document's _id
    fullDocument   struct   -- present for insert/replace/update (post-image)

Scale notes:
- ``watch`` is stateless (scan + filter): at 100 TB/day of changes the
  cost is the file listing + scan; the ``$match`` pipeline filter is
  translated to a Column predicate and evaluated scan-side, so dropped
  events never reach the state store of whatever runs downstream.
- ``apply_changes`` (CDC merge) shuffles both sides once on the document
  key; run it per microbatch via foreachBatch against a bucketed
  snapshot (sources/bucketed.py) and the snapshot side never re-shuffles.
- Resume is offset-based and exact: tokens are strictly increasing, so
  ``resume_after`` is a pushable ``_id > token`` predicate — replaying a
  compacted log re-derives identical state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mongo_arrow_spark.mql.match import translate_match

_META_DDL = (
    "_id bigint, operationType string, clusterTime timestamp, documentKey bigint"
)

_OPS = ("insert", "update", "replace", "delete")


def change_event_ddl(full_document_ddl: str) -> str:
    """Schema DDL of a change-event stream whose post-images have the
    given struct DDL (e.g. ``"sku string, qty bigint"``)."""
    return f"{_META_DDL}, fullDocument struct<{full_document_ddl}>"


def watch(
    spark: SparkSession,
    log_path: str,
    full_document_ddl: str,
    pipeline: list[dict] | None = None,
    resume_after: int | None = None,
    operation_types: list[str] | None = None,
) -> DataFrame:
    """Open a change stream over a change-log directory.

    ``pipeline`` supports the ``$match``/``$project`` prefix MongoDB
    allows on change streams, translated by the engine's own MQL layer and
    evaluated scan-side (predicates on ``operationType``,
    ``fullDocument.*`` etc.). ``resume_after`` resumes strictly after the
    given token, exactly like passing a resume token to the server.
    """
    from mongo_arrow_spark.streaming.events import read_document_stream

    stream = read_document_stream(
        spark, log_path, change_event_ddl(full_document_ddl)
    )
    if resume_after is not None:
        stream = stream.filter(F.col("_id") > int(resume_after))
    if operation_types:
        bad = set(operation_types) - set(_OPS)
        if bad:
            raise ValueError(f"unknown operationType(s): {sorted(bad)}")
        stream = stream.filter(F.col("operationType").isin(list(operation_types)))
    for stage in pipeline or []:
        (name, arg), = stage.items()
        if name == "$match":
            stream = stream.filter(translate_match(arg))
        elif name == "$project":
            keep = [k for k, v in arg.items() if v in (1, True)]
            drop = [k for k, v in arg.items() if v in (0, False)]
            if keep:
                # resume token always survives, like the server's _id rule
                cols = dict.fromkeys(["_id", *keep])
                stream = stream.select(*cols)
            elif drop:
                stream = stream.drop(*[c for c in drop if c != "_id"])
        else:
            raise ValueError(
                f"change streams accept only $match/$project here, got {name}"
            )
    return stream


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "_id",
    ts: Column | None = None,
    start_token: int = 0,
) -> DataFrame:
    """Derive a change-event stream from two snapshots (CDC diff).

    Rows only in ``new`` → insert; only in ``old`` → delete; in both but
    different → update (post-image). Equality is on the full row. One
    full-outer join on the key — the standard snapshot-diff shape; both
    sides shuffle once on ``id_col`` (bucketed snapshots avoid even that).
    Tokens are assigned by key order, starting strictly after
    ``start_token``, so successive diffs concatenate into one resumable
    log.
    """
    data_cols = [c for c in old.columns if c != id_col]
    if [c for c in new.columns if c != id_col] != data_cols:
        raise ValueError("snapshots must share one schema")
    o = old.select(
        F.col(id_col).alias("__k"), F.struct(*data_cols).alias("__old")
    )
    n = new.select(
        F.col(id_col).alias("__k"), F.struct(*data_cols).alias("__new")
    )
    j = o.join(n, "__k", "full_outer")
    op = (
        F.when(F.col("__old").isNull(), F.lit("insert"))
        .when(F.col("__new").isNull(), F.lit("delete"))
        .when(F.col("__old") != F.col("__new"), F.lit("update"))
    )
    ev = j.select(
        F.col("__k").alias("documentKey"),
        op.alias("operationType"),
        F.col("__new").alias("fullDocument"),
    ).filter(F.col("operationType").isNotNull())
    w = Window.orderBy("documentKey")
    return ev.select(
        (F.row_number().over(w) + F.lit(int(start_token))).alias("_id"),
        "operationType",
        (ts if ts is not None else F.current_timestamp()).alias("clusterTime"),
        "documentKey",
        "fullDocument",
    )


def maintain_snapshot(
    changes_stream: DataFrame,
    path: str,
    id_col: str = "_id",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Maintain a queryable parquet snapshot from a change stream: each
    microbatch is CDC-applied (``apply_changes``) onto the current
    snapshot and the result atomically replaces it. Returns the started
    StreamingQuery.

    This closes the loop: ``watch`` → ``maintain_snapshot`` keeps a table
    continuously consistent with the source, the same job a $merge-based
    oplog follower does server-side. The swap here is
    write-staging-then-rename — single-writer, local-filesystem
    semantics; on a real cluster back the snapshot with a transactional
    table format (or a bucketed table rewritten per batch) instead. The
    per-batch cost is one key-join of (snapshot ⋈ batch), so batch
    cadence, not stream volume, sizes the work; at 100 TB run the
    snapshot bucketed on the key so the join never reshuffles it.
    """
    import os
    import shutil
    import uuid as _uuid

    spark = changes_stream.sparkSession
    data_fields = [
        f for f in changes_stream.schema["fullDocument"].dataType.fields
    ]

    def one_batch(batch: DataFrame, batch_id: int) -> None:
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            snap = spark.read.parquet(path)
        else:
            snap = spark.createDataFrame(
                [],
                schema=(
                    f"{id_col} bigint, "
                    + ", ".join(
                        f"{f.name} {f.dataType.simpleString()}"
                        for f in data_fields
                    )
                ),
            )
        rebuilt = apply_changes(snap, batch, id_col=id_col)
        staging = f"{path}__staging_{batch_id}"
        rebuilt.write.mode("overwrite").parquet(staging)
        old = f"{path}__old_{_uuid.uuid4().hex[:8]}"
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(staging, path)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    writer = changes_stream.writeStream.foreachBatch(one_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def apply_changes(
    snapshot: DataFrame, changes: DataFrame, id_col: str = "_id"
) -> DataFrame:
    """Materialize a change stream onto a snapshot (CDC apply / compaction).

    Latest change per key wins (max resume token); a surviving
    insert/update/replace contributes its post-image, a delete removes the
    key. Keys untouched by the log pass through. This is the batch body
    you run inside ``foreachBatch`` to maintain a queryable table from a
    ``watch`` stream — and the inverse of ``diff_snapshots`` (applying a
    diff of A→B onto A yields exactly B; pinned by test).
    """
    data_cols = [c for c in snapshot.columns if c != id_col]
    w = Window.partitionBy("documentKey").orderBy(F.col("_id").desc())
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    survivors = latest.filter(F.col("operationType") != "delete").select(
        F.col("documentKey").alias(id_col),
        *[F.col(f"fullDocument.{c}").alias(c) for c in data_cols],
    )
    touched = latest.select(F.col("documentKey").alias(id_col))
    untouched = snapshot.join(touched, id_col, "left_anti")
    return untouched.unionByName(survivors)
