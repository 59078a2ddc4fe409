"""Scalar / cleaning / id / join kit.

Re-expresses the reference's ``etl/jobs/util/`` helpers as composable
column-expression functions (JVM-side, codegen-friendly — no Python UDFs).
"""

from pdcm_etl_spark.functions.cleaner import (  # noqa: F401
    init_cap_and_trim_all,
    lower_and_trim_all,
    null_values_to_empty_string,
    trim_all,
)
from pdcm_etl_spark.functions.ids import add_id, dense_id  # noqa: F401
from pdcm_etl_spark.functions.joins import (  # noqa: F401
    join_dfs,
    join_left_dfs,
    transform_to_fk,
)
