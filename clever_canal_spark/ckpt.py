"""localCheckpoint lifecycle helper shared by every periodic consumer.

``DataFrame.localCheckpoint`` materializes the plan as RDD storage
blocks but exposes no public release API — a long-running maintenance
loop (index syncs, rollup/sketch view syncs, label propagation) that
checkpoints per round must free each round's blocks explicitly or
storage memory accumulates until the JVM happens to GC the dereferenced
Dataset. One copy of the best-effort release lives here; the failure
mode is benign (the ContextCleaner frees the blocks at GC time anyway).
"""

from __future__ import annotations


def free_checkpoint(cp_df) -> None:
    """Best-effort unpersist of a localCheckpoint's materialized RDD
    (no public DataFrame API); on failure the ContextCleaner frees the
    blocks once the JVM GCs the dereferenced Dataset."""
    try:
        cp_df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass
