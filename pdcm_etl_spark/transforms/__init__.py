"""Pure-function entity transform catalog (ref: etl/jobs/transformation/*).

Every transform is ``f(dfs...) -> DataFrame`` with no I/O — the DAG runner
(plans/dag.py) wires inputs; sinks are applied at the edge. Ids are
deterministic (functions/ids.py) so outputs are reproducible run-to-run —
a deliberate fix of the reference's monotonically_increasing_id
nondeterminism (SURVEY §4).
"""
