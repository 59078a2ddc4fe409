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
