"""File-replay harness: run a batch table through Structured Streaming.

Writes the table as N parquet files and streams them with
``maxFilesPerTrigger=1`` so the query processes multiple micro-batches
(exercising incremental state), accumulating results via
``foreachBatch`` into a temp view for batch-equivalence assertions.
"""

from __future__ import annotations

import os
import tempfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def replay_stream(
    spark: SparkSession,
    batch_df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    *,
    n_files: int = 5,
    output_mode: str = "complete",
) -> DataFrame:
    """Replay ``batch_df`` as a file stream through ``transform``.

    Returns the final materialized result as a batch DataFrame.
    ``output_mode='complete'`` keeps the last micro-batch's full state
    (aggregations); ``'append'`` unions all emitted batches.
    """
    root = tempfile.mkdtemp(prefix="replay_")
    src = os.path.join(root, "src")
    batch_df.repartition(n_files).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = transform(stream)

    collected: list = []

    def _sink(bdf: DataFrame, epoch_id: int) -> None:
        if output_mode == "complete":
            collected.clear()
        collected.extend(bdf.collect())

    q = (
        out.writeStream.outputMode(output_mode)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .foreachBatch(_sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = list(collected)
    if not rows:
        return spark.createDataFrame([], out.schema)
    return spark.createDataFrame(rows, out.schema)
