"""Join helpers — FK resolution pattern.

Parity with reference ``etl/jobs/util/dataframe_functions.py:7-63``
(``join_dfs`` / ``join_left_dfs`` / ``transform_to_fk``): resolve a
natural-key column to a dimension id.

Scale posture: dimension sides here are small — we broadcast explicitly so
the plan is a BroadcastHashJoin regardless of statistics availability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_dfs(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    right_side = F.broadcast(right) if broadcast_right else right
    return left.join(right_side, left[left_on] == right_side[right_on], how)


def join_left_dfs(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    broadcast_right: bool = True,
) -> DataFrame:
    """Left join keeping all left rows (ref dataframe_functions.py:24-40)."""
    return join_dfs(left, right, left_on, right_on, "left", broadcast_right)


def transform_to_fk(
    df: DataFrame,
    dim: DataFrame,
    df_natural_key: str,
    dim_natural_key: str,
    dim_id: str,
    fk_name: str,
) -> DataFrame:
    """Replace a natural-key column by the dimension's id column
    (ref dataframe_functions.py:43-63). Dimension is broadcast. The dim's
    columns are aliased first so a fact-side ``id`` never collides."""
    dim_small = F.broadcast(
        dim.select(
            F.col(dim_natural_key).alias("__dim_key"), F.col(dim_id).alias(fk_name)
        )
    )
    joined = df.join(dim_small, df[df_natural_key] == dim_small["__dim_key"], "left")
    return joined.drop("__dim_key").drop(df_natural_key)

def salted_join(
    fact: DataFrame,
    skewed_dim: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-mitigated equi join: salt the fact side, replicate the other.

    When a handful of join-key values dominate (one provider with 100×
    the rows), a plain shuffle join sends each hot key to ONE reducer.
    Salting splits every key into ``salt_buckets`` sub-keys: the fact
    side gets a deterministic per-row salt (xxhash64 of the whole row —
    no rand(), so retried tasks and reruns produce identical plans), the
    other side is exploded ×``salt_buckets`` so every (key, salt)
    combination still meets its match. Hot keys then spread over
    ``salt_buckets`` reducers.

    AQE's skew-join split handles moderate skew automatically; explicit
    salting is for the pathological case (a key too large for one
    executor even after AQE splitting) and for non-AQE deployments.

    Only fact-preserving join types are supported: the dim side is
    replicated ×``salt_buckets``, so right/full-outer would emit each
    unmatched dim row ``salt_buckets`` times — a silent duplication trap.
    """
    if how not in ("inner", "left", "left_semi", "semi", "left_anti", "anti"):
        raise ValueError(
            f"salted_join supports fact-preserving joins only "
            f"(inner/left/left_semi/left_anti), got {how!r}: the replicated "
            f"dim side would duplicate unmatched dim rows {salt_buckets}x"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets))
    salted_fact = fact.withColumn("__salt", salt.cast("int"))
    replicated = skewed_dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>")),
    )
    return salted_fact.join(replicated, on + ["__salt"], how).drop("__salt")


def merge_keyed_aggregates(
    aggs: list[DataFrame],
    key: str,
    rename_key: str | None = None,
) -> DataFrame | None:
    """Collapse N per-key aggregate frames into ONE keyed frame.

    The reference denormalizes search_index by left-joining each per-model
    aggregate onto the model spine one at a time
    (search_index_transformer_job.py:42-126) — N aggregates = N
    sort-merge joins = 2N shuffle exchanges of model-cardinality data.
    At cluster scale those barriers dominate the flagship's wall time.

    Since every aggregate is itself a ``groupBy(key)`` result (≤1 row per
    key) with DISTINCT value-column names, the same result is expressible
    as one union + one aggregation:

        unionByName(allowMissingColumns=True)   # no shuffle, no barrier
        → groupBy(key).agg(first(c, ignorenulls=True) …)   # ONE shuffle

    The consumer then does a single left join against the spine. Plan
    effect measured on the flagship at sf0.01: 40 SortMergeJoins / 88
    Exchanges → ~24 joins / ~50 exchanges, and the per-aggregate shuffles
    collapse into one map-side-combined exchange of skinny rows.

    Returns None for an empty list. Frames may use ``rename_key`` (e.g.
    ``model_id``) instead of ``key``; both spellings are accepted.
    """
    from functools import reduce

    if not aggs:
        return None
    frames = []
    for a in aggs:
        if rename_key and rename_key in a.columns:
            if key in a.columns:
                # both spellings present: the rename would be skipped and
                # the stray rename_key column silently become a VALUE
                # column of the merged output — refuse instead
                raise ValueError(
                    f"merge_keyed_aggregates: frame carries both {key!r} "
                    f"and {rename_key!r}; drop or rename one before merging"
                )
            a = a.withColumnRenamed(rename_key, key)
        frames.append(a)
    if len(frames) == 1:
        return frames[0]
    # distinct-name precondition: a column name owned by two frames would
    # silently interleave under first(); join those the classic way instead
    seen: set[str] = set()
    for f in frames:
        dup = (set(f.columns) - {key}) & seen
        if dup:
            raise ValueError(
                f"merge_keyed_aggregates: column(s) {sorted(dup)} appear in "
                "multiple aggregate frames; join them separately"
            )
        seen |= set(f.columns) - {key}
    unioned = reduce(lambda l, r: l.unionByName(r, allowMissingColumns=True), frames)
    value_cols = [c for c in unioned.columns if c != key]
    return unioned.groupBy(key).agg(
        *[F.first(c, ignorenulls=True).alias(c) for c in value_cols]
    )


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str,
    num_bits: int = 1_048_576,
    num_hashes: int = 3,
) -> DataFrame:
    """Semi-join the fact table against a key set with a BLOOM-FILTER
    pre-prune built entirely from Catalyst expressions (Spark's own
    BloomFilterAggregate is optimizer-internal, not a registered
    function — so we build the same structure declaratively):

    1. each key sets ``num_hashes`` bit positions (xxhash64 with per-
       hash seeds, mod ``num_bits``);
    2. positions fold into 32-bit words via one bit_or aggregation —
       the bitmap is ≤ num_bits/32 rows, bounded by a PARAMETER, never
       by data;
    3. the word map collapses to ONE row (map_from_arrays) that
       broadcasts to every fact partition;
    4. the probe is pure map-side arithmetic — element_at + bitwise
       AND per hash — so non-matching fact rows die in the scan stage
       and never reach the semi-join shuffle.

    This is the manual form of Spark's runtime row-level filtering
    (InjectRuntimeFilter), exposed as an operator so the prune applies
    regardless of optimizer heuristics. At 100 TB the win is the
    shuffle delta: a 1% selective key set means ~99% of the fact never
    leaves its scan (modulo the false-positive rate set by
    num_bits/num_hashes). The exact semi-join afterwards removes false
    positives, so the RESULT is exact; only the transport is
    approximate — which is why the oracle is a plain IN-subquery.

    Returns the fact rows whose key is in ``keys``.
    """

    def positions(col):
        return [
            F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits))
            for i in range(num_hashes)
        ]

    # 32-bit words held in bigints: the bit mask is pow(2, b) which is
    # integer-exact in a double for b < 32 (F.shiftleft takes only a
    # Python-literal shift, so a column-valued shift needs this form)
    def bit_of(p):
        return F.pow(F.lit(2.0), F.pmod(p, F.lit(32))).cast("bigint")

    def word_of(p):
        return F.floor(p / 32).cast("bigint")

    pos = keys.select(
        F.explode(F.array(*positions(F.col(keys_key)))).alias("pos")
    )
    bitmap = (
        pos.select(
            word_of(F.col("pos")).alias("w"),
            bit_of(F.col("pos")).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
    )
    # Densify the sparse word set into a position-indexed ARRAY: a
    # runtime MAP is ArrayBasedMapData, whose element_at is a LINEAR
    # scan — probing a 32k-entry map per fact row is O(words) per
    # probe, and even a one-time sequence+map fill is O(words²) inside
    # a single task. Instead scatter distributedly: range(n_words)
    # left-joins the sparse words (both sides parameter-bounded), and
    # an array_sort(collect_list(struct)) assembles the dense vector —
    # O(n_words log n_words) total, then every probe is an O(1) array
    # index.
    n_words = (num_bits + 31) // 32
    spark = fact.sparkSession
    dense = (
        spark.range(n_words)
        .join(bitmap, F.col("id") == F.col("w"), "left")
        .select(F.col("id"), F.coalesce("word", F.lit(0)).alias("word"))
    )
    blob = dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("id", "word"))),
            lambda s: s["word"],
        ).alias("__bf")
    )
    hit = None
    for p in positions(F.col(fact_key)):
        this = (
            F.element_at("__bf", (word_of(p) + 1).cast("int"))
            .bitwiseAND(bit_of(p))
            != 0
        )
        hit = this if hit is None else (hit & this)
    pruned = fact.join(F.broadcast(blob)).filter(hit).drop("__bf")
    return pruned.join(
        keys.select(F.col(keys_key).alias(fact_key)).distinct(),
        fact_key,
        "left_semi",
    )


def join_cardinality_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Exact output cardinality of an equi join WITHOUT executing it:
    |A ⋈ B| = Σₖ cntA(k)·cntB(k) — the pre-flight that decides whether
    a fact⋈fact join is feasible at all (and finds the key whose
    per-key product dominates the output — the row-explosion hotspot
    salting/AQE can't fix, because it's real output, not skew).

    Two keyed count aggregations collapse both sides to key
    cardinality, meet in one key-keyed equi join, and reduce to ONE
    row — cost is two map-side-partial aggs + a key-sized join, never
    the join's own output. The product sum rides DECIMAL(38,0)
    (two 1e12-row hot keys alone give 1e24 output rows — int64 died
    at 9.2e18).

    Returns (left_rows, right_rows, n_common_keys, join_rows,
    max_key_rows) — max_key_rows is the largest single-key
    contribution.
    """
    la = left.groupBy(F.col(left_key).alias("k")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    ra = right.groupBy(F.col(right_key).alias("k")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    per_key = la.join(ra, "k").select(
        "k",
        (F.col("ca").cast("decimal(38,0)") * F.col("cb")).alias("p"),
    )
    lt = left.agg(F.count(F.lit(1)).cast("bigint").alias("left_rows"))
    rt = right.agg(F.count(F.lit(1)).cast("bigint").alias("right_rows"))
    agg = per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common_keys"),
        F.sum("p").cast("decimal(38,0)").alias("__jr"),
        F.max("p").cast("decimal(38,0)").alias("__mx"),
    )
    return (
        lt.crossJoin(F.broadcast(rt))
        .crossJoin(F.broadcast(agg))
        .select(
            "left_rows",
            "right_rows",
            "n_common_keys",
            F.col("__jr").cast("bigint").alias("join_rows"),
            F.col("__mx").cast("bigint").alias("max_key_rows"),
        )
    )
