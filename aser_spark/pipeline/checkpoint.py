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

With an Iceberg catalog steps 3-4 become a single atomic multi-table
transaction; on plain parquet the checkpoint row is the commit marker —
a partition is only ever trusted if its _checkpoints row exists.
"""

from __future__ import annotations

import datetime as _dt
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, functions as F

from .extract import extract_graph_instances

DEFAULT_PARTS = 64
_CKPT = "_checkpoints"


def with_part_id(transcripts: DataFrame, n_parts: int = DEFAULT_PARTS) -> DataFrame:
    return transcripts.withColumn(
        "part_id", F.pmod(F.xxhash64("conv_id"), F.lit(n_parts)).cast("int")
    )


def load_checkpoints(spark, workdir: str):
    path = Path(workdir) / _CKPT
    if not path.exists():
        return None
    return spark.read.parquet(str(path))


def done_part_ids(spark, workdir: str) -> set:
    ck = load_checkpoints(spark, workdir)
    if ck is None:
        return set()
    return {r.part_id for r in ck.filter(F.col("status") == "done").select("part_id").collect()}


def _clean_orphans(workdir: str, pending_parts: set):
    inst_dir = Path(workdir) / "instances"
    if not inst_dir.exists():
        return
    for d in inst_dir.glob("part_id=*"):
        pid = int(d.name.split("=")[1])
        if pid in pending_parts:
            shutil.rmtree(d)


def run_extraction_checkpointed(spark, transcripts: DataFrame, workdir: str,
                                n_parts: int = DEFAULT_PARTS,
                                source: str = "transcripts") -> DataFrame:
    """Extract graph instances for all not-yet-done partitions; returns the
    FULL instances DataFrame (all committed parts) for downstream stages."""
    Path(workdir).mkdir(parents=True, exist_ok=True)
    t = with_part_id(transcripts, n_parts)
    done = done_part_ids(spark, workdir)
    pending = set(range(n_parts)) - done

    if pending:
        _clean_orphans(workdir, pending)
        todo = t if not done else t.filter(~F.col("part_id").isin(*done))
        t0 = time.time()
        inst = extract_graph_instances(todo.select("conv_id", "turn_idx", "text"))
        inst = inst.withColumn(
            "part_id", F.pmod(F.xxhash64("conv_id"), F.lit(n_parts)).cast("int")
        )
        (inst.write.mode("append").partitionBy("part_id")
             .parquet(f"{workdir}/instances"))
        wall_ms = int((time.time() - t0) * 1000)

        written = spark.read.parquet(f"{workdir}/instances")
        stats = (
            written.filter(F.col("part_id").isin(*pending) if done else F.lit(True))
            .groupBy("part_id")
            .agg(
                F.countDistinct("conv_id").alias("n_convs"),
                F.sum(F.when(F.col("kind") == "node", 1).otherwise(0)).alias("n_node_instances"),
                F.sum(F.when(F.col("kind") == "edge", 1).otherwise(0)).alias("n_edge_instances"),
            )
            .withColumn("status", F.lit("done"))
            .withColumn("source", F.lit(source))
            .withColumn("wall_ms_batch", F.lit(wall_ms))
            .withColumn("committed_at", F.lit(_dt.datetime.utcnow().isoformat()))
        )
        # partitions with zero instances still need a commit marker
        seen = {r.part_id for r in stats.select("part_id").collect()}
        empty = sorted(pending - seen)
        if empty:
            empty_rows = spark.createDataFrame(
                [(p, 0, 0, 0, "done", source, wall_ms,
                  _dt.datetime.utcnow().isoformat()) for p in empty],
                schema=stats.schema,
            )
            stats = stats.unionByName(empty_rows)
        stats.write.mode("append").parquet(f"{workdir}/{_CKPT}")

    return spark.read.parquet(f"{workdir}/instances").drop("part_id")
