"""Round-7 registry extensions — each a (query, DuckDB-oracle) pair
like plans/extensions.py. Headline: the persisted-IVF serving path
(index built once per session, queries served from the saved bucketed
layout with zero k-means in the plan).

Determinism rules are the repo-wide ones (plans/catalog.py header).
"""

from __future__ import annotations

import atexit
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
        tag = re.sub(r"[^A-Za-z0-9_]", "_", f"{app}_{os.path.basename(sf_dir.rstrip('/'))}")
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
