"""Round-7 registry extensions — each a (query, DuckDB-oracle) pair
like plans/extensions.py. Headline: the persisted-IVF serving path
(index built once per session, queries served from the saved bucketed
layout with zero k-means in the plan).

Determinism rules are the repo-wide ones (plans/catalog.py header).
"""

from __future__ import annotations

import atexit
import hashlib
import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdcm_etl_spark.plans.extensions import SQL_ANN_IVF_TRAINED_TOPK, _t

# (applicationId, sf_dir) -> (centroids_path, cells_table_name).
# Build-once-per-session memo: the production contract is that the
# index is an artifact, not a query step — bench reps 2+ and the
# correctness gate both serve from the same persisted layout.
_IVF_INDEX: dict[tuple[str, str], tuple[str, str]] = {}


def x_ann_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k served from a PERSISTED index
    (operators/similarity.py::ivf_index_persist / ivf_persisted_topk):
    first call per session trains k-means and writes the centroid
    parquet + the cell-bucketed vector table (per-applicationId temp
    dir, the partition_prune isolation pattern); every later call —
    bench reps, the gate, the determinism screen — reads the saved
    layout. The serve plan carries two parquet scans and NO training
    artifacts (plan-pinned: no posexplode, no decimal(28,9) centroid
    sums). Same parameters as ann_ivf_trained_topk, so the oracle is
    the identical SQL — persisted-serve ≡ inline-trained, proven by
    the shared hash."""
    from pdcm_etl_spark.operators.similarity import (
        ivf_index_persist,
        ivf_persisted_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    app = spark.sparkContext.applicationId
    key = (app, sf_dir)
    if key not in _IVF_INDEX:
        # hash of the FULL path, not just the basename: two sf_dirs
        # sharing a basename must never collide on persisted artifacts
        digest = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        tag = re.sub(
            r"[^A-Za-z0-9_]",
            "_",
            f"{app}_{os.path.basename(sf_dir.rstrip('/'))}_{digest}",
        )
        base = os.path.join(tempfile.gettempdir(), f"pdcm_ivf_{tag}")
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        ivf_index_persist(
            emb,
            base_dir=base,
            table_name=f"ivf_cells_{tag}",
            n_cells=4,
            iterations=1,
            n_buckets=8,
        )
        _IVF_INDEX[key] = (f"{base}/centroids", f"ivf_cells_{tag}")
    cents_path, tbl = _IVF_INDEX[key]
    centroids = spark.read.parquet(cents_path)
    cells = spark.table(tbl)
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_persisted_topk(centroids, cells, queries, k=10, n_probe=2)


# persisted-serve must equal the inline-trained pipeline bit-for-bit
SQL_ANN_IVF_PERSISTED = SQL_ANN_IVF_TRAINED_TOPK


EXTENSION_C_CATALOG: dict[str, tuple] = {
    "ann_ivf_persisted": (x_ann_ivf_persisted, SQL_ANN_IVF_PERSISTED),
}


def x_winsorize_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority winsorization of order totals at the [2%, 98%]
    basis-point order statistics (operators/ml.py::winsorize_group):
    clip-don't-drop outlier taming, bit-exact discrete bounds, ONE
    group-keyed shuffle (rank + size + both boundary extractions are
    windows over the same partitioning — no join-back)."""
    from pdcm_etl_spark.operators.ml import winsorize_group

    orders = _t(spark, sf_dir, "orders")
    metric = (
        F.col("o_totalprice").cast("decimal(18,6)") * 1000000
    ).cast("bigint")
    return winsorize_group(
        orders, key_col="o_orderpriority", id_col="o_orderkey",
        value_micro=metric, lo_bp=200, hi_bp=9800,
    )


SQL_WINSORIZE_GROUP = """
WITH base AS (
  SELECT o_orderpriority AS key, o_orderkey AS id,
         CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS m
  FROM orders WHERE o_totalprice IS NOT NULL
), r AS (
  SELECT key, id, m,
         CAST(ROW_NUMBER() OVER (PARTITION BY key ORDER BY m, id)
              AS BIGINT) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT) AS n
  FROM base
), ix AS (
  SELECT *, GREATEST((200 * n + 9999) // 10000, 1) AS lo_idx,
            GREATEST((9800 * n + 9999) // 10000, 1) AS hi_idx
  FROM r
), b AS (
  SELECT *,
         MAX(CASE WHEN rn = lo_idx THEN m END)
           OVER (PARTITION BY key) AS lo_micro,
         MAX(CASE WHEN rn = hi_idx THEN m END)
           OVER (PARTITION BY key) AS hi_micro
  FROM ix
)
SELECT id, key, m AS value_micro, lo_micro, hi_micro,
       GREATEST(lo_micro, LEAST(hi_micro, m)) AS winsorized_micro
FROM b
"""

EXTENSION_C_CATALOG["winsorize_group"] = (
    x_winsorize_group, SQL_WINSORIZE_GROUP)


def x_link_predict_cn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 predicted links by common-neighbor count over the
    undirected version of pagerank's synthetic part-key graph
    (operators/graph.py::link_predict_cn): wedge generation through
    degree-capped centers — never all-pairs — one pair-keyed count,
    anti join against existing edges, TakeOrderedAndProject top-k."""
    from pdcm_etl_spark.operators.graph import link_predict_cn

    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") >= 1)
    n = part.count()  # scalar — the graph's node-count modulus
    pk = part.select(F.col("p_partkey").cast("bigint").alias("k"))
    e1 = pk.select(
        F.col("k").alias("src"), F.expr("k div 10").alias("dst")
    ).filter(F.col("dst") >= 1)
    e2 = pk.select(
        F.col("k").alias("src"),
        F.expr(f"1 + ((31 * k + 7) % {n})").alias("dst"),
    )
    return link_predict_cn(
        e1.unionByName(e2), k=50, max_center_degree=64
    )


def _sql_link_predict_cn() -> str:
    return """
WITH pk AS (
  SELECT CAST(p_partkey AS BIGINT) AS k FROM part WHERE p_partkey >= 1
), nn AS (SELECT COUNT(*) AS c FROM pk),
e0 AS (
  SELECT k AS src, k // 10 AS dst FROM pk WHERE k // 10 >= 1
  UNION ALL
  SELECT k, 1 + ((31 * k + 7) % (SELECT c FROM nn)) FROM pk
),
und AS (
  SELECT DISTINCT s, d FROM (
    SELECT src AS s, dst AS d FROM e0
    UNION ALL SELECT dst, src FROM e0
  ) WHERE s <> d
),
ok AS (
  SELECT s AS c FROM und GROUP BY s HAVING COUNT(*) <= 64
),
nbrs AS (
  SELECT u.s AS c, u.d AS nb FROM und u JOIN ok ON u.s = ok.c
),
cn AS (
  SELECT w1.nb AS a, w2.nb AS b, CAST(COUNT(*) AS BIGINT) AS common_neighbors
  FROM nbrs w1 JOIN nbrs w2 ON w1.c = w2.c AND w1.nb < w2.nb
  GROUP BY 1, 2
)
SELECT a AS node_a, b AS node_b, common_neighbors
FROM cn
WHERE NOT EXISTS (SELECT 1 FROM und WHERE und.s = cn.a AND und.d = cn.b)
ORDER BY common_neighbors DESC, a ASC, b ASC
LIMIT 50
"""


EXTENSION_C_CATALOG["link_predict_cn"] = (
    x_link_predict_cn, _sql_link_predict_cn())


def x_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch revenue attribution over 30-min-gap sessions of
    the event stream (operators/temporal.py::attribution_touch):
    purchase revenue credited to the session-opening event type and to
    the last pre-conversion touch; one user-keyed + one session-keyed
    shuffle, melt map-side, final agg touch-type-sized."""
    from pdcm_etl_spark.operators.temporal import attribution_touch
    from pdcm_etl_spark.plans.catalog import load_events

    return attribution_touch(load_events(spark, sf_dir))


SQL_ATTRIBUTION_TOUCH = """
WITH lagged AS (
  SELECT user_id AS u, ts, event_id AS id, event_type AS typ,
         CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v_micro,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS __new
  FROM lagged
), sess AS (
  SELECT u, ts, id, typ, v_micro,
         SUM(__new) OVER (PARTITION BY u ORDER BY ts, id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sess
  FROM flagged
), conv AS (
  SELECT u, sess, ts, id,
         ROW_NUMBER() OVER (PARTITION BY u, sess ORDER BY ts, id) AS rn
  FROM sess WHERE typ = 'purchase'
), fc AS (
  SELECT u, sess, ts AS fts, id AS fid FROM conv WHERE rn = 1
), firsts AS (
  SELECT u, sess, typ AS first_touch,
         ROW_NUMBER() OVER (PARTITION BY u, sess ORDER BY ts, id) AS rn
  FROM sess
), lasts AS (
  SELECT s.u, s.sess, s.typ AS last_touch,
         ROW_NUMBER() OVER (PARTITION BY s.u, s.sess
                            ORDER BY s.ts DESC, s.id DESC) AS rn
  FROM sess s JOIN fc ON s.u = fc.u AND s.sess = fc.sess
  WHERE s.typ <> 'purchase' AND (s.ts, s.id) < (fc.fts, fc.fid)
), rev AS (
  SELECT u, sess,
         CAST(SUM(CASE WHEN typ = 'purchase'
                       THEN CAST(v_micro AS HUGEINT) END) AS BIGINT)
           AS rev_micro
  FROM sess GROUP BY 1, 2
), per_session AS (
  SELECT fc.u, fc.sess, f.first_touch,
         COALESCE(l.last_touch, 'direct') AS last_touch, r.rev_micro
  FROM fc
  JOIN firsts f ON f.u = fc.u AND f.sess = fc.sess AND f.rn = 1
  LEFT JOIN lasts l ON l.u = fc.u AND l.sess = fc.sess AND l.rn = 1
  JOIN rev r ON r.u = fc.u AND r.sess = fc.sess
), melted AS (
  SELECT 'first' AS model, first_touch AS touch_type, rev_micro
  FROM per_session
  UNION ALL
  SELECT 'last', last_touch, rev_micro FROM per_session
)
SELECT model, touch_type, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CAST(rev_micro AS HUGEINT)) AS BIGINT) AS revenue_micro
FROM melted GROUP BY 1, 2
"""

EXTENSION_C_CATALOG["attribution_touch"] = (
    x_attribution_touch, SQL_ATTRIBUTION_TOUCH)


# (applicationId, sf_dir) -> (centroids_path, cells_table) for the
# BASE-only index behind the delta-append query
_IVF_BASE_INDEX: dict[tuple[str, str], tuple[str, str]] = {}


def x_ann_ivf_delta_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF refresh (operators/similarity.py::
    ivf_delta_assign): the index is built ONCE over the base corpus
    (vec_id ≥ 10); a delta (5 ≤ vec_id < 10) is assigned against the
    SAVED centroids by one broadcast join + map-side argmin and
    unioned into the cell layout; queries (vec_id < 5) are served from
    the refreshed index with no k-means anywhere in the serve or
    refresh plan. The dedup_minhash_incremental twin for similarity
    search. Oracle: the same Lloyd round over the base in SQL, the
    same delta assignment, the same probe + re-rank."""
    from pdcm_etl_spark.operators.similarity import (
        ivf_delta_assign,
        ivf_index_persist,
        ivf_persisted_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 10)
    delta = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 10))
    queries = emb.filter(F.col("vec_id") < 5)
    app = spark.sparkContext.applicationId
    key = (app, sf_dir)
    if key not in _IVF_BASE_INDEX:
        digest = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        tag = re.sub(
            r"[^A-Za-z0-9_]",
            "_",
            f"{app}_{os.path.basename(sf_dir.rstrip('/'))}_{digest}_base",
        )
        bdir = os.path.join(tempfile.gettempdir(), f"pdcm_ivf_{tag}")
        atexit.register(shutil.rmtree, bdir, ignore_errors=True)
        ivf_index_persist(
            base, base_dir=bdir, table_name=f"ivf_cells_{tag}",
            n_cells=4, iterations=1, n_buckets=8,
        )
        _IVF_BASE_INDEX[key] = (f"{bdir}/centroids", f"ivf_cells_{tag}")
    cents_path, tbl = _IVF_BASE_INDEX[key]
    centroids = spark.read.parquet(cents_path)
    refreshed = spark.table(tbl).unionByName(
        ivf_delta_assign(centroids, delta)
    )
    return ivf_persisted_topk(centroids, refreshed, queries, k=10, n_probe=2)


SQL_ANN_IVF_DELTA_APPEND = """
WITH seeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM (SELECT * FROM embeddings WHERE vec_id >= 10 ORDER BY vec_id LIMIT 4)
), d1 AS (
  SELECT e.vec_id, e.embedding, s.cid,
         list_reduce(list_transform(range(64), i ->
           (CAST(e.embedding[i+1] AS DOUBLE) - s.cv[i+1])
           * (CAST(e.embedding[i+1] AS DOUBLE) - s.cv[i+1])),
           (a,b) -> a + b) AS dist
  FROM embeddings e CROSS JOIN seeds s WHERE e.vec_id >= 10
), a1 AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
    FROM d1
  ) WHERE rn = 1
), m1 AS (
  SELECT cid, i AS pos,
         CAST(SUM(CAST(CAST(embedding[i+1] AS DOUBLE) AS DECIMAL(28,9)))
              * 1000000000 AS BIGINT) AS s_nano,
         COUNT(*) AS n
  FROM a1, (SELECT unnest(range(64)) AS i)
  GROUP BY 1, 2
), c1 AS (
  SELECT cid,
         list((s_nano - ((s_nano % n) + n) % n) // n / 1000000000.0
              ORDER BY pos) AS cv
  FROM m1 GROUP BY cid
), d2 AS (
  SELECT e.vec_id, s.cid,
         list_reduce(list_transform(range(64), i ->
           (CAST(e.embedding[i+1] AS DOUBLE) - s.cv[i+1])
           * (CAST(e.embedding[i+1] AS DOUBLE) - s.cv[i+1])),
           (a,b) -> a + b) AS dist
  FROM embeddings e CROSS JOIN c1 s WHERE e.vec_id >= 5
), a2 AS (
  SELECT vec_id, cid FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
    FROM d2
  ) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id < 5
), qd AS (
  SELECT q.query_id, s.cid,
         list_reduce(list_transform(range(64), i ->
           (q.qv[i+1] - s.cv[i+1]) * (q.qv[i+1] - s.cv[i+1])),
           (a,b) -> a + b) AS dist
  FROM q CROSS JOIN c1 s
), probes AS (
  SELECT query_id, cid FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY dist ASC, cid ASC) AS rn
    FROM qd
  ) WHERE rn <= 2
), v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
), scored AS (
  SELECT p.query_id, a2.vec_id AS neighbor_id,
         CAST(FLOOR(list_dot_product(qv.v, iv.v) / (qv.nrm * iv.nrm)
                    * 1000000.0) AS BIGINT) AS score_ppm
  FROM probes p
  JOIN a2 ON a2.cid = p.cid AND a2.vec_id <> p.query_id
  JOIN v qv ON qv.vec_id = p.query_id
  JOIN v iv ON iv.vec_id = a2.vec_id
)
SELECT query_id, neighbor_id, score_ppm,
       CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score_ppm DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
"""

EXTENSION_C_CATALOG["ann_ivf_delta_append"] = (
    x_ann_ivf_delta_append, SQL_ANN_IVF_DELTA_APPEND)


def x_stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER range join
    (streaming/events_stream.py::attribution_stream_left_join): clicks
    joined to same-user purchases in the preceding hour; unconverted
    clicks null-emit once no match can still arrive. Deterministic
    under AvailableNow: the global watermark is the MIN of the two
    per-stream watermarks (multipleWatermarkPolicy=min), i.e.
    min(max click_ts, max purchase_ts) − 1 day, and an outer click
    null-emits iff click_ts < that watermark — the oracle applies the
    identical cutoff, empirically pinned at BOTH sf0.001 (200 = 200)
    and sf0.01 (1941 = 1941); the trailing-window clicks are
    deterministically absent, exactly the rows a restarted production
    stream would emit later."""
    from pdcm_etl_spark.streaming.events_stream import (
        attribution_stream_left_join,
    )

    return attribution_stream_left_join(spark, sf_dir)


SQL_STREAM_LEFT_OUTER_JOIN = """
WITH mx AS (
  SELECT LEAST(
    (SELECT MAX(ts) FROM events WHERE event_type = 'click'),
    (SELECT MAX(ts) FROM events WHERE event_type = 'purchase')) AS m
),
clicks AS (
  SELECT event_id, user_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
), pur AS (
  SELECT user_id AS pu, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
), j AS (
  SELECT c.event_id, c.user_id, c.click_ts, p.purchase_ts
  FROM clicks c LEFT JOIN pur p
    ON c.user_id = p.pu
   AND c.click_ts >= p.purchase_ts
   AND c.click_ts <= p.purchase_ts + INTERVAL 1 HOUR
)
SELECT event_id, user_id, click_ts, purchase_ts,
       purchase_ts IS NOT NULL AS matched
FROM j
WHERE purchase_ts IS NOT NULL
   OR click_ts < (SELECT m FROM mx) - INTERVAL 24 HOUR
"""

EXTENSION_C_CATALOG["stream_left_outer_join"] = (
    x_stream_left_outer_join, SQL_STREAM_LEFT_OUTER_JOIN)


def x_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type distribution drift across the 2024-01-16 cutoff
    (operators/analytics.py::distribution_drift): per-category ppm
    shares of the before/after slices and the absolute drift —
    integer-exact total-variation signal (no PSI ln). One conditional
    agg + broadcast totals."""
    from pdcm_etl_spark.operators.analytics import distribution_drift
    from pdcm_etl_spark.plans.catalog import load_events

    ev = load_events(spark, sf_dir)
    return distribution_drift(
        ev, "event_type", F.col("ts") >= F.lit("2024-01-16")
    )


SQL_DISTRIBUTION_DRIFT = """
WITH per_key AS (
  SELECT event_type AS key,
         CAST(SUM(CASE WHEN ts >= '2024-01-16' THEN 0 ELSE 1 END)
              AS BIGINT) AS n_before,
         CAST(SUM(CASE WHEN ts >= '2024-01-16' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_after
  FROM events GROUP BY 1
), t AS (
  SELECT SUM(n_before) AS tb, SUM(n_after) AS ta FROM per_key
)
SELECT key, n_before, n_after,
       CAST(CASE WHEN t.tb = 0 THEN 0
            ELSE (CAST(n_before AS HUGEINT) * 1000000) // t.tb END
            AS BIGINT) AS share_before_ppm,
       CAST(CASE WHEN t.ta = 0 THEN 0
            ELSE (CAST(n_after AS HUGEINT) * 1000000) // t.ta END
            AS BIGINT) AS share_after_ppm,
       ABS(CAST(CASE WHEN t.ta = 0 THEN 0
            ELSE (CAST(n_after AS HUGEINT) * 1000000) // t.ta END
            AS BIGINT)
         - CAST(CASE WHEN t.tb = 0 THEN 0
            ELSE (CAST(n_before AS HUGEINT) * 1000000) // t.tb END
            AS BIGINT)) AS drift_ppm
FROM per_key, t
"""

EXTENSION_C_CATALOG["distribution_drift"] = (
    x_distribution_drift, SQL_DISTRIBUTION_DRIFT)


def x_quantile_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile binning of order totals per priority
    (operators/ml.py::quantile_bin): equal-frequency discretization,
    type-1 exact, one group-keyed shuffle (rank + size windows share
    the partitioning; bin is arithmetic — no join-back)."""
    from pdcm_etl_spark.operators.ml import quantile_bin

    orders = _t(spark, sf_dir, "orders")
    metric = (
        F.col("o_totalprice").cast("decimal(18,6)") * 1000000
    ).cast("bigint")
    return quantile_bin(
        orders, key_col="o_orderpriority", id_col="o_orderkey",
        value_micro=metric, n_bins=10,
    )


SQL_QUANTILE_BIN = """
WITH base AS (
  SELECT o_orderpriority AS key, o_orderkey AS id,
         CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS m
  FROM orders WHERE o_totalprice IS NOT NULL
), r AS (
  SELECT key, id, m,
         CAST(ROW_NUMBER() OVER (PARTITION BY key ORDER BY m, id)
              AS BIGINT) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT) AS n
  FROM base
)
SELECT id, key, m AS value_micro, (rn * 10 + n - 1) // n AS bin
FROM r
"""

EXTENSION_C_CATALOG["quantile_bin"] = (x_quantile_bin, SQL_QUANTILE_BIN)


def x_trimmed_mean_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed mean of order totals per priority
    (operators/ml.py::trimmed_mean_group): robust location between
    median and mean, integer-exact, one group-keyed shuffle (rank/size
    windows + a same-key conditional aggregation)."""
    from pdcm_etl_spark.operators.ml import trimmed_mean_group

    orders = _t(spark, sf_dir, "orders")
    metric = (
        F.col("o_totalprice").cast("decimal(18,6)") * 1000000
    ).cast("bigint")
    return trimmed_mean_group(
        orders, key_col="o_orderpriority", id_col="o_orderkey",
        value_micro=metric, trim_bp=500,
    )


SQL_TRIMMED_MEAN_GROUP = """
WITH base AS (
  SELECT o_orderpriority AS key, o_orderkey AS id,
         CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS m
  FROM orders WHERE o_totalprice IS NOT NULL
), r AS (
  SELECT key, id, m,
         CAST(ROW_NUMBER() OVER (PARTITION BY key ORDER BY m, id)
              AS BIGINT) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT) AS n
  FROM base
), marked AS (
  SELECT *, (rn > (500 * n) // 10000
             AND rn <= n - ((500 * n) // 10000)) AS keep
  FROM r
)
SELECT key, CAST(MAX(n) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(CASE WHEN SUM(CASE WHEN keep THEN 1 ELSE 0 END) = 0 THEN NULL
            ELSE SUM(CASE WHEN keep THEN CAST(m AS HUGEINT) END)
                 // SUM(CASE WHEN keep THEN 1 ELSE 0 END) END
            AS BIGINT) AS trimmed_mean_micro,
       CAST(SUM(CAST(m AS HUGEINT)) // COUNT(*) AS BIGINT) AS mean_micro
FROM marked GROUP BY key
"""

EXTENSION_C_CATALOG["trimmed_mean_group"] = (
    x_trimmed_mean_group, SQL_TRIMMED_MEAN_GROUP)


def x_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view→purchase conversion delay by acquisition cohort
    (operators/temporal.py::funnel_time_to_convert): per user, the
    seconds from first view to the first purchase after it; converted
    users grouped by first-event day with exact discrete p50/p90 —
    one user-keyed shuffle (stacked full-frame windows), one
    cohort-keyed quantile pass."""
    from pdcm_etl_spark.operators.temporal import funnel_time_to_convert
    from pdcm_etl_spark.plans.catalog import load_events

    return funnel_time_to_convert(load_events(spark, sf_dir))


SQL_FUNNEL_TIME_TO_CONVERT = """
WITH ev AS (
  SELECT user_id AS u, ts, event_id AS id, event_type AS typ FROM events
), firsts AS (
  SELECT u, ts, ROW_NUMBER() OVER (PARTITION BY u ORDER BY ts, id) AS rn
  FROM ev
), fe AS (
  SELECT u, date_trunc('day', ts) AS cohort_day FROM firsts WHERE rn = 1
), fv AS (
  SELECT u, ts AS vts, id AS vid FROM (
    SELECT u, ts, id,
           ROW_NUMBER() OVER (PARTITION BY u ORDER BY ts, id) AS rn
    FROM ev WHERE typ = 'view'
  ) WHERE rn = 1
), fc AS (
  SELECT u, cts FROM (
    SELECT e.u, e.ts AS cts,
           ROW_NUMBER() OVER (PARTITION BY e.u ORDER BY e.ts, e.id) AS rn
    FROM ev e JOIN fv ON e.u = fv.u
    WHERE e.typ = 'purchase' AND (e.ts, e.id) > (fv.vts, fv.vid)
  ) WHERE rn = 1
), conv AS (
  SELECT fe.u, CAST(fe.cohort_day AS TIMESTAMP) AS cohort_day,
         CAST(FLOOR(EPOCH(fc.cts - fv.vts)) AS BIGINT) AS convert_s
  FROM fe JOIN fv ON fe.u = fv.u JOIN fc ON fe.u = fc.u
), r AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY cohort_day
                                    ORDER BY convert_s, u) AS BIGINT) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY cohort_day) AS BIGINT) AS n
  FROM conv
)
SELECT cohort_day, CAST(MAX(n) AS BIGINT) AS n_converted,
       MAX(CASE WHEN rn = (50 * n + 99) // 100 THEN convert_s END)
         AS p50_convert_s,
       MAX(CASE WHEN rn = (90 * n + 99) // 100 THEN convert_s END)
         AS p90_convert_s
FROM r GROUP BY cohort_day
"""

EXTENSION_C_CATALOG["funnel_time_to_convert"] = (
    x_funnel_time_to_convert, SQL_FUNNEL_TIME_TO_CONVERT)


def x_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS statistic of the event value metric across
    the 2024-01-16 cutoff (operators/analytics.py::ks_drift): purely
    rank-based — zero float surface — cross-multiplied ECDF gap in
    DECIMAL, final ppm render. distribution_drift's numeric
    companion."""
    from pdcm_etl_spark.operators.analytics import ks_drift
    from pdcm_etl_spark.plans.catalog import load_events

    ev = load_events(spark, sf_dir)
    metric = (F.col("value").cast("decimal(18,6)") * 1000000).cast("bigint")
    return ks_drift(
        ev, metric, F.col("ts") >= F.lit("2024-01-16"), id_col="event_id"
    )


SQL_KS_DRIFT = """
WITH tagged AS (
  SELECT CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS m,
         event_id AS id,
         CASE WHEN ts >= '2024-01-16' THEN 1 ELSE 0 END AS a
  FROM events WHERE value IS NOT NULL
), cum AS (
  SELECT m, a,
         SUM(a) OVER w AS cum_a,
         COUNT(*) OVER w - SUM(a) OVER w AS cum_b
  FROM tagged
  WINDOW w AS (ORDER BY m, a, id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), v AS (
  SELECT m,
         MAX(cum_a) OVER (PARTITION BY m) AS va,
         MAX(cum_b) OVER (PARTITION BY m) AS vb
  FROM cum
), t AS (
  SELECT CAST(SUM(1 - a) AS BIGINT) AS n_before,
         CAST(SUM(a) AS BIGINT) AS n_after
  FROM tagged
)
SELECT t.n_before, t.n_after,
       CAST(CASE WHEN t.n_before = 0 OR t.n_after = 0 THEN NULL
            ELSE (MAX(ABS(CAST(vb AS HUGEINT) * t.n_after
                          - CAST(va AS HUGEINT) * t.n_before)) * 1000000)
                 // (CAST(t.n_before AS HUGEINT) * t.n_after) END
            AS BIGINT) AS ks_ppm
FROM v, t
GROUP BY t.n_before, t.n_after
"""

EXTENSION_C_CATALOG["ks_drift"] = (x_ks_drift, SQL_KS_DRIFT)


def x_grouped_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-event-type ROC-AUC of the value metric as a predictor
    of 'is this a purchase-user event' (operators/ml.py::
    grouped_auc_ppm): Mann–Whitney over the score histogram —
    histogram agg + one key-partitioned cumulative window + final agg,
    all integer/DECIMAL. The model-eval primitive."""
    from pdcm_etl_spark.operators.ml import grouped_auc_ppm
    from pdcm_etl_spark.plans.catalog import load_events

    ev = load_events(spark, sf_dir)
    metric = (F.col("value").cast("decimal(18,6)") * 1000000).cast("bigint")
    return grouped_auc_ppm(
        ev.filter(F.col("event_type").isin("click", "view", "purchase")),
        key_col="event_type",
        score_micro=metric,
        label_pred=F.col("user_id") % 3 == 0,
    )


SQL_GROUPED_AUC = """
WITH base AS (
  SELECT event_type AS key,
         CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS s,
         CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS y
  FROM events
  WHERE event_type IN ('click', 'view', 'purchase') AND value IS NOT NULL
), hist AS (
  SELECT key, s, CAST(SUM(y) AS BIGINT) AS np,
         CAST(SUM(1 - y) AS BIGINT) AS nn
  FROM base GROUP BY 1, 2
), cum AS (
  SELECT *, CAST(COALESCE(SUM(nn) OVER (PARTITION BY key ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS neg_below
  FROM hist
)
SELECT key, CAST(SUM(np) AS BIGINT) AS n_pos,
       CAST(SUM(nn) AS BIGINT) AS n_neg,
       CAST(CASE WHEN SUM(np) = 0 OR SUM(nn) = 0 THEN NULL ELSE
         ((2 * SUM(CAST(np AS HUGEINT) * neg_below)
           + SUM(CAST(np AS HUGEINT) * nn)) * 1000000)
         // (2 * CAST(SUM(np) AS HUGEINT) * SUM(nn)) END AS BIGINT)
         AS auc_ppm
FROM cum GROUP BY key
"""

EXTENSION_C_CATALOG["grouped_auc"] = (x_grouped_auc, SQL_GROUPED_AUC)


def x_etl_search_index_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta-aware flagship (plans/incremental.py): the base run's
    materialized search_index (partitioned by provider) merged with ONE
    provider's freshly-recomputed rows — the metadata DAG runs over
    that provider's raw modules alone. The oracle is the FULL-REBUILD
    67-column SQL, so every driver-hash check proves delta-applied ≡
    rebuilt from scratch (what the reference's Luigi memoization cannot
    do: a provider drop there reruns the whole DAG over all data —
    etl/workflow/config.py:4-7)."""
    from pdcm_etl_spark.plans.incremental import (
        run_etl_search_index_incremental,
    )

    return run_etl_search_index_incremental(spark, sf_dir)


def _sql_incremental_oracle() -> str:
    from pdcm_etl_spark.plans.catalog_extra import (
        _sql_etl_search_index_full,
    )

    return _sql_etl_search_index_full()


EXTENSION_C_CATALOG["etl_search_index_incremental"] = (
    x_etl_search_index_incremental,
    _sql_incremental_oracle(),
)
