"""Table catalog over the lake's parquet zones.

The reference registers processed-zone schemas via a Glue Crawler so Athena
can query them (reference: README.md:28). Parquet is self-describing, so the
Spark-native "crawler" is just `spark.read.parquet` + temp-view
registration — no external catalog service.

Scale note: each accessor returns a *lazy* DataFrame over the parquet path;
Catalyst handles column pruning and predicate/partition pushdown, so callers
should filter/select as early as possible and let the scan do the work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables: always broadcast-join these against facts.
SMALL_DIMS = frozenset({"region", "nation", "supplier", "customer", "part"})


def path_tag(path) -> str:
    """Stable 16-hex-digit tag for a filesystem path, for naming scratch
    dirs keyed by their source dataset. md5 of the path string — NOT
    Python's salted ``hash()``, whose 10**8-modded values can collide
    across two sf_dirs in one process, making the second index build
    rmtree the first while its cache entry still passes existence checks."""
    import hashlib

    return hashlib.md5(str(path).encode()).hexdigest()[:16]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every lake table as a temp view for spark.sql access."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def spread(df: DataFrame) -> DataFrame:
    """Rebalance a compute-dense input to cluster parallelism when the scan
    under-splits it.

    Single-row-group parquet files (and generally any source with fewer
    splits than cores) serialize everything up to the first shuffle onto
    one task. For operators whose pre-shuffle segment EXPANDS the data
    10-60x (shingling, span digests, bigram extraction — per-row
    higher-order transforms + explode), that one task dominates wall
    clock. A round-robin repartition of the *raw* rows costs one shuffle
    of the input bytes — the cheap side of the expansion — and unlocks
    full parallelism for the expensive segment.

    No-op when the scan already yields >= defaultParallelism splits, which
    is the normal case at scale (a 100 TB table has thousands of
    row-groups); the repartition only fires on under-split inputs, where
    its cost is by construction small.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # .rdd here converts the plan to an RDD to read its partitioning —
    # metadata-only (no job runs), but it does cost a plan translation per
    # call; acceptable because spread() wraps table loads, not hot loops.
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
