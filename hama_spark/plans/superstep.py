"""Superstep chaining — Hama's ``BSPJob.setSupersteps`` composition
(reference: bsp/Superstep.java:24-53, bsp/SuperstepBSP.java:28-70).

In Spark a "superstep class" is just a DataFrame transform; chaining is
an ordered fold in the driver with an optional halt predicate per step.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

Step = Callable[[DataFrame, int], DataFrame]


def run_supersteps(
    df: DataFrame,
    steps: list[Step],
    halt: Callable[[DataFrame, int], bool] | None = None,
    checkpoint_interval: int = 4,
) -> DataFrame:
    """Fold ``steps`` over ``df`` in order; stop early if ``halt`` fires.

    Mirrors SuperstepBSP's loop: compute -> haltComputation? -> sync. The
    "sync" barrier is implicit (each step's output feeds the next stage).
    """
    for i, step in enumerate(steps):
        df = step(df, i)
        if i % checkpoint_interval == checkpoint_interval - 1:
            df = df.localCheckpoint(eager=True)
        if halt is not None and halt(df, i):
            break
    return df
