"""Per-partition checkpointed extraction with lineage + metrics.

The reference resumes by skipping files whose processed_path exists
(/root/reference/aser/extract/utils.py:565-570).  Our unit of work is a
conversation-hash partition: part_id = pmod(xxhash64(conv_id), n_parts).

Protocol (north_rule: "resumable from checkpoint with per-partition
lineage + metrics"):

1. read ``<workdir>/_checkpoints`` -> set of DONE part_ids;
2. pending = transcripts where part_id not done; orphan staging dirs of
   pending parts (from a killed run) are deleted first, so re-extraction is
   exactly-once;
3. extract pending -> append ``<workdir>/instances`` partitioned by
   part_id;
4. append one _checkpoints row per finished part: counts, wall clock,
   source lineage.

All filesystem inspection goes through the Hadoop FileSystem API resolved
from the workdir URI — NOT local ``Path``/``shutil`` — so the same code
runs against file://, hdfs://, s3a://, ... (the Iceberg-production story).
With an Iceberg catalog steps 3-4 become a single atomic multi-table
transaction; on plain parquet the checkpoint row is the commit marker —
a partition is only ever trusted if its _checkpoints row exists.
"""

from __future__ import annotations

import datetime as _dt
import time

from pyspark.sql import DataFrame, functions as F, types as T

from ..schemas import INSTANCE_SCHEMA
from .extract import extract_graph_instances

DEFAULT_PARTS = 64
_CKPT = "_checkpoints"

CHECKPOINT_SCHEMA = T.StructType([
    T.StructField("part_id", T.IntegerType(), True),
    T.StructField("n_convs", T.LongType(), True),
    T.StructField("n_node_instances", T.LongType(), True),
    T.StructField("n_edge_instances", T.LongType(), True),
    T.StructField("status", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("mode", T.StringType(), True),
    T.StructField("wall_ms_batch", T.LongType(), True),
    T.StructField("committed_at", T.StringType(), True),
])

INSTANCE_PART_SCHEMA = T.StructType(
    list(INSTANCE_SCHEMA.fields) + [T.StructField("part_id", T.IntegerType(), True)]
)


def _fs(spark, path_str: str):
    """(Hadoop FileSystem, Path) for any URI scheme the cluster supports."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    return path.getFileSystem(spark._jsc.hadoopConfiguration()), path


def _exists(spark, path_str: str) -> bool:
    fs, p = _fs(spark, path_str)
    return fs.exists(p)


def _list_names(spark, dir_str: str) -> list:
    fs, p = _fs(spark, dir_str)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def _delete(spark, path_str: str) -> None:
    fs, p = _fs(spark, path_str)
    if fs.exists(p):
        fs.delete(p, True)


def _mkdirs(spark, path_str: str) -> None:
    fs, p = _fs(spark, path_str)
    fs.mkdirs(p)


def with_part_id(transcripts: DataFrame, n_parts: int = DEFAULT_PARTS) -> DataFrame:
    return transcripts.withColumn(
        "part_id", F.pmod(F.xxhash64("conv_id"), F.lit(n_parts)).cast("int")
    )


def load_checkpoints(spark, workdir: str):
    path = f"{workdir}/{_CKPT}"
    if not _exists(spark, path):
        return None
    # explicit schema: an empty (or footerless) checkpoint dir must read as
    # zero rows, not fail schema inference
    return spark.read.schema(CHECKPOINT_SCHEMA).parquet(path)


def done_part_ids(spark, workdir: str) -> set:
    ck = load_checkpoints(spark, workdir)
    if ck is None:
        return set()
    return {r.part_id for r in ck.filter(F.col("status") == "done").select("part_id").collect()}


def _clean_orphans(spark, workdir: str, pending_parts: set):
    """Delete staging dirs of UNCOMMITTED parts left by a killed run —
    via the Hadoop FS of the workdir, so object stores work too."""
    inst_dir = f"{workdir}/instances"
    for name in _list_names(spark, inst_dir):
        if not name.startswith("part_id="):
            continue
        pid = int(name.split("=")[1])
        if pid in pending_parts:
            _delete(spark, f"{inst_dir}/{name}")


def _read_instances(spark, workdir: str) -> DataFrame:
    path = f"{workdir}/instances"
    if not _exists(spark, path):
        return spark.createDataFrame([], INSTANCE_PART_SCHEMA)
    return spark.read.schema(INSTANCE_PART_SCHEMA).parquet(path)


def run_extraction_checkpointed(spark, transcripts: DataFrame, workdir: str,
                                n_parts: int = DEFAULT_PARTS,
                                source: str = "transcripts",
                                mode: str = "seed") -> DataFrame:
    """Extract graph instances for all not-yet-done partitions; returns the
    FULL instances DataFrame (all committed parts) for downstream stages.

    The extraction ``mode`` ('seed' | 'discourse') is recorded in every
    _checkpoints row; resuming a workdir whose committed parts were
    extracted under a DIFFERENT mode fails fast — the two kernels emit
    different eids/relations, so mixing them would silently corrupt the
    instances table."""
    _mkdirs(spark, workdir)
    # one read serves both the mode guard and the done-part scan (matters
    # on object stores: _checkpoints is listed+read once per resume)
    ck = load_checkpoints(spark, workdir)
    done = set()
    if ck is not None:
        rows = (ck.filter(F.col("status") == "done")
                .select("part_id", "mode").collect())
        prior_modes = {r.mode for r in rows}
        if None in prior_modes:
            # legacy pre-mode-column rows: we cannot prove which kernel
            # produced them, so resuming under EITHER mode risks a mixed
            # instances table — refuse, like the streaming '<unrecorded>'
            # marker path, instead of silently assuming compatibility
            raise ValueError(
                f"workdir {workdir} holds committed partitions with no "
                "recorded extraction mode (pre-mode-column layout); "
                "refusing to resume — re-extract into a fresh workdir")
        if prior_modes - {mode}:
            raise ValueError(
                f"workdir {workdir} holds partitions extracted with mode="
                f"{sorted(prior_modes)}; refusing to resume with mode={mode!r}")
        done = {r.part_id for r in rows}
    t = with_part_id(transcripts, n_parts)
    pending = set(range(n_parts)) - done

    if pending:
        _clean_orphans(spark, workdir, pending)
        todo = t if not done else t.filter(~F.col("part_id").isin(*done))
        t0 = time.time()
        inst = extract_graph_instances(todo.select("conv_id", "turn_idx", "text"),
                                       mode=mode)
        inst = inst.withColumn(
            "part_id", F.pmod(F.xxhash64("conv_id"), F.lit(n_parts)).cast("int")
        )
        (inst.write.mode("append").partitionBy("part_id")
             .parquet(f"{workdir}/instances"))
        wall_ms = int((time.time() - t0) * 1000)

        # stats over the JUST-WRITTEN partitions only (partition pruning on
        # part_id keeps this from rescanning every committed part)
        written = _read_instances(spark, workdir).filter(
            F.col("part_id").isin(*pending))
        stats = (
            written
            .groupBy("part_id")
            .agg(
                F.countDistinct("conv_id").alias("n_convs"),
                F.sum(F.when(F.col("kind") == "node", 1).otherwise(0)).alias("n_node_instances"),
                F.sum(F.when(F.col("kind") == "edge", 1).otherwise(0)).alias("n_edge_instances"),
            )
            .withColumn("status", F.lit("done"))
            .withColumn("source", F.lit(source))
            .withColumn("mode", F.lit(mode))
            .withColumn("wall_ms_batch", F.lit(wall_ms))
            .withColumn("committed_at", F.lit(_dt.datetime.utcnow().isoformat()))
        )
        # partitions with zero instances still need a commit marker
        seen = {r.part_id for r in stats.select("part_id").collect()}
        empty = sorted(pending - seen)
        if empty:
            empty_rows = spark.createDataFrame(
                [(p, 0, 0, 0, "done", source, mode, wall_ms,
                  _dt.datetime.utcnow().isoformat()) for p in empty],
                schema=stats.schema,
            )
            stats = stats.unionByName(empty_rows)
        stats.write.mode("append").parquet(f"{workdir}/{_CKPT}")

    return _read_instances(spark, workdir).drop("part_id")
