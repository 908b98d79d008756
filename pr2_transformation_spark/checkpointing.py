"""Checkpoint-mode seam for iterative / multiply-consumed frames.

The dedup/similarity/graph operators materialize intermediate frames
(signatures, cluster assignments, edge lists) that feed several plan arms
or every iteration of a loop.  ``localCheckpoint`` is the right default on
a healthy cluster — no durable storage round-trip — but its blocks live on
executors: ONE lost executor invalidates them and fails every downstream
job.  For 1000-executor runs, where executor loss is routine, callers pass
``checkpoint="reliable"`` to write the frame to the Spark checkpoint
directory (HDFS/object store) instead; the extra write is the insurance
premium.

Every operator that checkpoints takes ``checkpoint: "local" | "reliable"
| None`` and routes through :func:`checkpoint_frame`, so the policy is a
call-site decision, not a library constant.  ``None`` disables
materialization entirely (useful when the caller checkpoints or persists
the result itself).

Both modes produce a LogicalRDD that captures the frame's partitioning
and ordering, so the exchange-free join plans the operators rely on are
preserved either way.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

CheckpointMode = Optional[str]  # "local" | "reliable" | None


def checkpoint_frame(df: DataFrame, mode: CheckpointMode, eager: bool = True) -> DataFrame:
    """Materialize (or not) a frame according to ``mode``.

    * ``"local"``    — ``localCheckpoint``: executor-block storage, fastest,
      lost with any executor that held blocks.
    * ``"reliable"`` — ``checkpoint``: written to the SparkContext
      checkpoint directory; survives executor loss.  Requires
      ``spark.sparkContext.setCheckpointDir(...)`` — raises a clear error
      otherwise instead of Spark's late job-time failure.
    * ``None``       — passthrough (no truncation, no materialization).
    """
    if mode is None:
        return df
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "reliable":
        sc = df.sparkSession.sparkContext
        if not sc.getCheckpointDir():
            raise RuntimeError(
                "checkpoint='reliable' requires a checkpoint directory: call "
                "spark.sparkContext.setCheckpointDir('<hdfs-or-object-store-path>') "
                "before running the operator"
            )
        return df.checkpoint(eager=eager)
    raise ValueError(f"unknown checkpoint mode {mode!r} (local | reliable | None)")
