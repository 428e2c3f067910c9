"""RandBench (SURVEY §6) — the reference's message round-trip benchmark.

Reference: examples/RandBench.java:40-110: every superstep each peer
sends ``nCommunications`` messages of ``sizeOfMsg`` bytes to random
peers, then sync(); the tool measures shuffle round-trip throughput.

Spark equivalent: a "peer" is a key in [0, num_peers); one superstep is
one seeded message generation + groupBy(peer) + eager localCheckpoint
(the barrier). Destinations come from md5 bits keyed by
(superstep, msg_id, seed), so the received-count distribution is
deterministic and has an exact DuckDB twin — the benchmark doubles as a
correctness query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rand_bench(
    spark: SparkSession,
    num_peers: int = 32,
    msgs_per_superstep: int = 10_000,
    msg_size: int = 100,
    supersteps: int = 5,
    seed: int = 42,
) -> DataFrame:
    """-> (peer, n_received, bytes_received) aggregated over all
    supersteps. Wall-clock of this query ÷ supersteps ≈ per-superstep
    shuffle round-trip cost at the given message volume."""
    rounds = []
    for s in range(supersteps):
        peer = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{s}:"), F.col("id").cast("string"), F.lit(f":{seed}")
                        ).cast("binary")
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % num_peers
        )
        msgs = spark.range(msgs_per_superstep).select(peer.alias("peer"))
        received = msgs.groupBy("peer").agg(
            F.count(F.lit(1)).alias("n"), (F.count(F.lit(1)) * msg_size).alias("b")
        )
        # the sync() barrier: materialize this superstep's shuffle before
        # the next begins
        rounds.append(received.localCheckpoint(eager=True))

    total = rounds[0]
    for r in rounds[1:]:
        total = total.unionByName(r)
    return total.groupBy("peer").agg(
        F.sum("n").cast("long").alias("n_received"),
        F.sum("b").cast("long").alias("bytes_received"),
    )
