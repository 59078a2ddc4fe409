"""Declarative DAG runner — replaces the reference's Luigi orchestration.

The reference launches one spark-submit per entity with parquet round-trips
between every task (~60 write/read barriers, transformer.py:74-79). Here
the whole entity graph is one Spark application: nodes are pure transform
functions, edges are declared dependencies, intermediates stay as in-memory
lineage (Catalyst sees the full plan), and only entities marked
``materialize`` hit storage. Multiply-consumed nodes are persisted to
avoid recomputation (the reference's molecular_characterization pattern,
SURVEY §4).
"""

from __future__ import annotations

import threading
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel


@dataclass
class Node:
    name: str
    fn: Callable[..., DataFrame]
    deps: list[str] = field(default_factory=list)
    # pass the SparkSession as first arg (for source/static nodes)
    needs_spark: bool = False
    # cheap projection of an already-materialized input: never checkpoint
    # it, even when multiply consumed — each consumer's column pruning
    # through the thin plan beats re-serializing the wide frame
    cheap: bool = False


class EntityDag:
    """Topologically-executed entity graph with memoization.

    ``reuse`` controls how multiply-consumed nodes are shared:

    - ``"checkpoint"`` (default): ``localCheckpoint(eager=False)`` — the
      node is computed once, stored like a persisted DataFrame, **and its
      logical lineage is truncated**. With ~50 chained entities, full
      lineage makes Catalyst re-analyze an ever-deeper tree for every
      downstream node (quadratic driver cost — measured ~40% of flagship
      wall time at sf0.1); truncation makes analysis O(node).
    - ``"persist"``: plain ``persist(MEMORY_AND_DISK)``, full lineage
      kept. Use on clusters where executor loss must be recoverable —
      localCheckpoint data dies with its executor, persisted data can be
      recomputed from lineage.
    """

    def __init__(self, spark: SparkSession, reuse: str | None = None):
        import os

        self.spark = spark
        # SPARK_GRAFT_DAG_REUSE flips the sharing mode without a code
        # change — "persist" keeps lineage for executor-loss recovery
        # on clusters, "checkpoint" is the roomy-heap fast path (see
        # class docstring). Memory-pressure note (measured at sf1, 4g
        # heap): the binding variable is PER-TASK memory, not the mode —
        # 4g ÷ 32 concurrent tasks (128 MB/task) kills the flagship in
        # either mode, 4g ÷ 4 tasks completes with ~18 GB of spill and
        # zero OOM (scripts_dev/mem_pressure.py; a real 4g executor
        # container runs 2-4 cores, exactly that profile)
        self.reuse = reuse or os.environ.get(
            "SPARK_GRAFT_DAG_REUSE", "checkpoint"
        )
        self.nodes: dict[str, Node] = {}
        self._results: dict[str, DataFrame] = {}

    def add(self, name, fn, deps=None, needs_spark=False,
            cheap=False) -> "EntityDag":
        self.nodes[name] = Node(name, fn, list(deps or []), needs_spark, cheap)
        return self

    def add_input(self, name: str, df: DataFrame) -> "EntityDag":
        self._results[name] = df
        return self

    def get(self, name: str) -> DataFrame:
        """Resolve a node (and its transitive deps) memoized."""
        if name in self._results:
            return self._results[name]
        if name not in self.nodes:
            raise KeyError(f"unknown entity '{name}' (not a node or input)")
        node = self.nodes[name]
        args = [self.get(d) for d in node.deps]
        if node.needs_spark:
            df = node.fn(self.spark, *args)
        else:
            df = node.fn(*args)
        df = self._share_if_reused(name, df)
        self._results[name] = df
        return df

    def _share_if_reused(
        self, name: str, df: DataFrame, scope: set[str] | None = None
    ) -> DataFrame:
        """Nodes consumed by >1 downstream node are computed once and
        reused — replaces the reference's parquet round-trip barriers.

        ``scope`` restricts the consumer count to the nodes a targeted
        run actually resolves: a node whose second consumer lives outside
        the requested subgraph must NOT be materialized — the checkpoint
        barrier would block Catalyst's column pruning / filter pushdown
        through it for zero reuse benefit (e.g. a measurement table's
        profile consumer when only search_index is asked for)."""
        if self.nodes[name].cheap:
            return df
        nodes = self.nodes.values() if scope is None else (
            self.nodes[n] for n in scope
        )
        consumers = sum(1 for n in nodes if name in n.deps)
        if consumers > 1:
            if self.reuse == "checkpoint":
                df = df.localCheckpoint(eager=False)
            else:
                df = df.persist(StorageLevel.MEMORY_AND_DISK)
        return df

    def materialized_run(
        self,
        materialize_dir: str,
        targets: list[str] | None = None,
        parallelism: int = 8,
    ) -> dict[str, DataFrame]:
        """Resumable run — the reference's Luigi file-existence memoization
        (etl/workflow/config.py:4-7 LocalTarget: completed stages skip).

        Every resolved entity is written to ``materialize_dir/<name>`` as
        parquet; entities whose directory already holds a ``_SUCCESS``
        marker are loaded from parquet instead of recomputed (and their
        upstream subtree is never resolved unless another target needs
        it). Crash mid-run → rerun redoes only the missing entities.
        """
        import os

        names = targets or list(self.nodes)
        done = {}
        for n in list(self.nodes):
            path = os.path.join(materialize_dir, n)
            if os.path.exists(os.path.join(path, "_SUCCESS")):
                done[n] = self.spark.read.parquet(path)
        # pre-seed results so resolution treats finished entities as inputs
        self._results.update(done)
        out = self.run(targets=names, parallelism=parallelism)
        # persist EVERY resolved entity, not just the targets — the
        # intermediates are what a later incremental_run serves clean
        # nodes from (and what a crash-resume skips)
        for n in list(self._results):
            if n in done or n not in self.nodes:
                continue
            path = os.path.join(materialize_dir, n)
            self._results[n].write.mode("overwrite").parquet(path)
            self._results[n] = self.spark.read.parquet(path)
            if n in out:
                out[n] = self._results[n]
        return out

    def dirty_downstream(self, changed_inputs: set[str]) -> set[str]:
        """Entity nodes transitively downstream of the given input /
        node names — the set a data-incremental rerun must recompute.
        Everything else is provably unaffected and can load from a
        prior run's materialization."""
        dirty: set[str] = set()
        for n in self.topological_order():
            if any(
                d in changed_inputs or d in dirty
                for d in self.nodes[n].deps
            ):
                dirty.add(n)
        return dirty

    def incremental_run(
        self,
        materialize_dir: str,
        changed_inputs: set[str],
        targets: list[str] | None = None,
        parallelism: int = 8,
    ) -> tuple[dict[str, DataFrame], set[str], set[str]]:
        """DATA-incremental rerun over a prior ``materialized_run``
        directory: only entities transitively downstream of
        ``changed_inputs`` (raw module names like ``raw/treatment``, as
        diffed by operators/cdc.py::snapshot_diff) are recomputed — every
        clean entity loads from its committed parquet and its upstream
        subtree is never resolved.

        This is the capability the reference's Luigi memoization lacks
        (etl/workflow/config.py:4-7 skips completed STAGES of the same
        run; a new provider drop invalidates every target file and
        reruns everything): here invalidation follows the DATA dependency
        graph, so a drop touching one module recomputes only that
        module's cone. Recomputed entities re-materialize over their
        stale parquet, so consecutive incremental runs compose.

        Returns ``(results, recomputed, loaded)`` — the latter two are
        the observable proof that the run touched a strict subset.
        """
        import os

        dirty = self.dirty_downstream(changed_inputs)
        names = targets or list(self.nodes)
        loaded: set[str] = set()
        for n in list(self.nodes):
            if n in dirty:
                continue
            path = os.path.join(materialize_dir, n)
            if os.path.exists(os.path.join(path, "_SUCCESS")):
                self._results[n] = self.spark.read.parquet(path)
                loaded.add(n)
        self.run(targets=names, parallelism=parallelism)
        recomputed = {
            n for n in self._results
            if n in dirty and n in self.nodes
        }
        for n in recomputed:
            path = os.path.join(materialize_dir, n)
            df = self._results[n]
            df.write.mode("overwrite").parquet(path)
            self._results[n] = self.spark.read.parquet(path)
        return (
            {n: self._results[n] for n in names},
            recomputed,
            loaded,
        )

    def run(
        self,
        targets: list[str] | None = None,
        parallelism: int = 24,
    ) -> dict[str, DataFrame]:
        """Resolve all (or the given) entities; returns name → DataFrame.

        Nodes are resolved on a thread pool in dependency order: each node
        starts as soon as its deps are done. This matters because resolving
        a checkpointed node executes its upstream shuffle stages (AQE
        finalizes the plan when the RDD is created) — serially that puts
        every materialization on the critical path; threaded, independent
        subgraphs overlap and the wall time is the DAG's critical path
        (measured sf0.1 flagship: 45.9s → 27.7s cold at 8 threads; 24
        threads takes warm 32s → 24s — the per-node materializations are
        small jobs, so a deeper submission queue keeps the scheduler fed;
        executors are shared FIFO either way). Spark job submission is
        thread-safe; node fns are pure plan builders. ``parallelism=1``
        falls back to sequential resolution.
        """
        names = targets or list(self.nodes)
        if parallelism <= 1:
            return {n: self.get(n) for n in names}

        # transitive closure of what the targets need
        needed: set[str] = set()
        stack = [n for n in names if n not in self._results]
        while stack:
            n = stack.pop()
            if n in needed:
                continue
            if n not in self.nodes:
                raise KeyError(f"unknown entity '{n}' (not a node or input)")
            needed.add(n)
            stack.extend(
                d for d in self.nodes[n].deps
                if d not in self._results and d not in needed
            )

        futures: dict[str, Future] = {}
        lock = threading.Lock()

        def resolve(name: str) -> DataFrame:
            node = self.nodes[name]
            args = [
                self._results[d] if d in self._results else futures[d].result()
                for d in node.deps
            ]
            df = (
                node.fn(self.spark, *args)
                if node.needs_spark
                else node.fn(*args)
            )
            df = self._share_if_reused(name, df, scope=needed)
            with lock:
                self._results[name] = df
            return df

        with ThreadPoolExecutor(max_workers=parallelism) as pool:
            # topo order guarantees dep futures exist before dependents
            for n in self.topological_order():
                if n in needed:
                    futures[n] = pool.submit(resolve, n)
            return {
                n: futures[n].result() if n in futures else self._results[n]
                for n in names
            }

    def topological_order(self) -> list[str]:
        order: list[str] = []
        seen: set[str] = set()
        visiting: set[str] = set()

        def visit(n: str):
            if n in seen or n in self._results and n not in self.nodes:
                return
            if n in visiting:
                raise ValueError(f"dependency cycle at '{n}'")
            visiting.add(n)
            for d in self.nodes.get(n, Node(n, lambda: None)).deps:
                if d in self.nodes:
                    visit(d)
            visiting.discard(n)
            if n in self.nodes:
                seen.add(n)
                order.append(n)

        for n in self.nodes:
            visit(n)
        return order


def build_metadata_dag(spark: SparkSession, raw: dict[str, DataFrame]) -> EntityDag:
    """Wire the metadata entity cluster (the reference DAG's first third:
    extractor.py → dims → patient/model). ``raw`` maps module name →
    all-string DataFrame (from sources.tsv or test fixtures)."""
    from pdcm_etl_spark.transforms import dims, model as model_t, patient as patient_t

    dag = EntityDag(spark)
    for name, df in raw.items():
        dag.add_input(f"raw/{name}", df)

    dag.add("ethnicity", dims.ethnicity, ["raw/patient"])
    dag.add("provider_type", dims.provider_type, ["raw/source"])
    dag.add("project_group", dims.project_group, ["raw/source"])
    dag.add(
        "provider_group",
        dims.provider_group,
        ["raw/source", "provider_type", "project_group"],
    )
    dag.add(
        "publication_group", dims.publication_group, ["raw/model", "raw/cell_model"]
    )
    dag.add("accessibility_group", dims.accessibility_group, ["raw/sharing"])
    dag.add("contact_people", dims.contact_people, ["raw/sharing"])
    dag.add("contact_form", dims.contact_form, ["raw/sharing"])
    dag.add("source_database", dims.source_database, ["raw/sharing"])
    dag.add("license", lambda s: dims.license_table(s), [], needs_spark=True)

    # static / config-as-table entities (always present)
    from pdcm_etl_spark.transforms import images as img_t
    from pdcm_etl_spark.transforms.molecular import molecular_characterization_type

    dag.add(
        "molecular_characterization_type",
        molecular_characterization_type,
        [],
        needs_spark=True,
    )
    dag.add(
        "molecular_data_restriction",
        img_t.molecular_data_restriction,
        [],
        needs_spark=True,
    )

    dag.add(
        "patient", patient_t.patient, ["raw/patient", "ethnicity", "provider_group"]
    )
    dag.add(
        "initial_model",
        model_t.initial_model,
        ["raw/model", "raw/cell_model", "raw/sharing"],
    )
    dag.add(
        "model",
        model_t.model,
        [
            "initial_model", "publication_group", "accessibility_group",
            "contact_people", "contact_form", "source_database", "license",
        ],
    )
    dag.add("cell_model", model_t.cell_model, ["raw/cell_model", "model"])

    # optional clusters — wired only when their raw modules are provided
    from pdcm_etl_spark.transforms import (
        molecular as mol_t,
        ontology as ont_t,
        sample as sample_t,
        search as search_t,
        treatment as tr_t,
    )

    if "sample" in raw:
        dag.add("tissue", sample_t.tissue, ["raw/sample"])
        dag.add("tumour_type", sample_t.tumour_type, ["raw/sample"])
        dag.add(
            "patient_sample",
            sample_t.patient_sample,
            ["raw/sample", "patient", "tissue", "tumour_type", "initial_model"],
        )

    if "drug_dosing" in raw and "patient_treatment" in raw:
        dag.add("response", tr_t.response, ["raw/drug_dosing", "raw/patient_treatment"])
        dag.add(
            "response_classification",
            tr_t.response_classification,
            ["raw/drug_dosing", "raw/patient_treatment"],
        )
        dag.add(
            "treatment_protocol",
            tr_t.treatment_protocol,
            ["raw/drug_dosing", "raw/patient_treatment", "initial_model",
             "patient", "response", "response_classification"],
        )
        dag.add(
            "treatment_component_helper",
            tr_t.treatment_and_component_helper,
            ["treatment_protocol"],
        )
        dag.add("treatment", tr_t.treatment, ["treatment_component_helper"])
        dag.add(
            "treatment_component",
            tr_t.treatment_component,
            ["treatment_component_helper", "treatment"],
        )
        agg_deps = ["treatment_protocol", "treatment_component_helper", "response"]
        if "patient_sample" in dag.nodes:
            agg_deps.append("patient_sample")
        dag.add(
            "treatment_aggregation_by_model",
            tr_t.treatment_aggregation_by_model,
            agg_deps,
        )

    if "model_validation" in raw:
        from pdcm_etl_spark.transforms import specimen as spec_t

        dag.add(
            "quality_assurance",
            spec_t.quality_assurance,
            ["raw/model_validation", "initial_model"],
        )
        dag.add("qa_json_agg", _qa_json_adapter, ["quality_assurance"])
    if "model" in raw:
        from pdcm_etl_spark.transforms import lineage as lin_t, specimen as spec_t

        dag.add("engraftment_site", spec_t.engraftment_site, ["raw/model"])
        dag.add("engraftment_type", spec_t.engraftment_type, ["raw/model"])
        dag.add("engraftment_sample_type", spec_t.engraftment_sample_type, ["raw/model"])
        dag.add("engraftment_sample_state", spec_t.engraftment_sample_state, ["raw/model"])
        dag.add("host_strain", spec_t.host_strain, ["raw/model"])
        dag.add(
            "xenograft_model_specimen",
            spec_t.xenograft_model_specimen,
            ["raw/model", "engraftment_site", "engraftment_type",
             "engraftment_sample_type", "engraftment_sample_state",
             "initial_model", "host_strain"],
        )
        dag.add("model_relationships", lin_t.model_relationships, ["initial_model"])
        dag.add(
            "specimens_json_agg",
            _specimens_json_adapter,
            ["xenograft_model_specimen", "host_strain",
             "engraftment_site", "engraftment_type",
             "engraftment_sample_type", "engraftment_sample_state"],
        )

    if "molchar_sample" in raw and "molchar_platform" in raw:
        dag.add(
            "molecular_characterization",
            mol_t.molecular_characterization,
            ["raw/molchar_sample", "raw/molchar_platform"],
        )
        # (mol_char_id, model_id, molchar_type) with internal model ids —
        # shared by dataset_available + every per-model molecular aggregate
        dag.add(
            "model_molchar",
            _resolve_molchar_model_ids,
            ["molecular_characterization", "initial_model"],
        )
        dag.add("dataset_available", _dataset_available_adapter, ["model_molchar"])
        dag.add(
            "platform",
            sample_t.platform,
            ["raw/molchar_platform", "provider_group"],
        )
        dag.add(
            "cell_sample",
            sample_t.cell_sample,
            ["raw/molchar_sample", "model", "platform"],
        )
        if "model" in raw:
            dag.add(
                "xenograft_sample",
                sample_t.xenograft_sample,
                ["raw/molchar_sample", "host_strain", "model", "platform"],
            )

        # per-type molecular measurement tables + the column-profile
        # entity (available_molecular_data_columns_transformer_job.py)
        meas_mods = [
            m for m in ("mutation", "cna", "expression", "biomarker", "immunemarker")
            if m in raw
        ]
        # gene-symbol columns exist on mutation/cna/expression/biomarker
        # (immunemarker keys on marker_name — never harmonised, matching
        # the reference's per-type GeneHelper wiring)
        harmonisable = {"mutation", "cna", "expression", "biomarker"}
        h_mods = (
            [m for m in meas_mods if m in harmonisable]
            if "markers" in raw
            else []
        )
        if len(h_mods) >= 2:
            # ONE 5-stage cascade over the tagged union of every
            # harmonisable module instead of one cascade per module: the
            # inputs are disjoint row sets, the cascade is row-local
            # (broadcast lookups only), so a '__mtype' tag + post-filter
            # gives identical rows/ids while the cascade plan is built
            # and materialized once (multi-consumer persist rule) rather
            # than 4x. Plan-construction profile at sf0.01: the four
            # *_measurement_data nodes were 4 of the 5 hottest nodes.
            dag.add(
                "harmonised_measurements",
                _harmonised_union_adapter(h_mods),
                [f"raw/{m}" for m in h_mods]
                + ["gene_marker", "gene_marker_previous_symbols",
                   "gene_marker_alias_symbols"],
            )
        for mod in meas_mods:
            if mod in h_mods and len(h_mods) >= 2:
                dag.add(
                    f"{mod}_measurement_data",
                    _measurement_slice_adapter(mod),
                    ["harmonised_measurements", f"raw/{mod}",
                     "molecular_characterization"],
                    # thin slice of the checkpointed cascade union: let
                    # each consumer prune columns through it (the marker
                    # aggregates read 2 of ~30 columns and skip the row
                    # hash entirely) instead of re-materializing the
                    # wide frame
                    cheap=True,
                )
                continue
            deps = [f"raw/{mod}", "molecular_characterization"]
            if mod in harmonisable and "markers" in raw:
                deps += ["gene_marker", "gene_marker_previous_symbols",
                         "gene_marker_alias_symbols"]
            dag.add(f"{mod}_measurement_data", _measurement_adapter, deps)
        if meas_mods:
            dag.add(
                "available_molecular_data_columns",
                _available_columns_adapter(meas_mods),
                [f"{m}_measurement_data" for m in meas_mods],
            )
        # per-model marker-list aggregates for search_index
        # (search_index_molecular_data_transformer_job.py:296-315): one
        # markers_with_<type>_data array per measurement type
        for mod, out_col, sym in [
            ("mutation", "markers_with_mutation_data", "symbol"),
            ("cna", "markers_with_cna_data", "symbol"),
            ("expression", "markers_with_expression_data", "symbol"),
            ("biomarker", "markers_with_biomarker_data", "symbol"),
        ]:
            if mod in meas_mods:
                dag.add(
                    out_col,
                    _genes_per_model_adapter(out_col, sym),
                    [f"{mod}_measurement_data", "model_molchar"],
                )
        if "immunemarker" in meas_mods:
            dag.add(
                "msi_status",
                _msi_adapter,
                ["immunemarker_measurement_data", "model_molchar"],
            )
            dag.add(
                "hla_types",
                _hla_adapter,
                ["immunemarker_measurement_data", "model_molchar"],
            )
        if "biomarker" in meas_mods:
            dag.add(
                "breast_cancer_biomarkers",
                _breast_biomarkers_adapter,
                ["biomarker_measurement_data", "model_molchar"],
            )
        # raw-data archive names per model (ENA/EGA/GEO from raw_data_url;
        # ref model_metadata_transformer_job.py:88-89)
        dag.add(
            "raw_data_resources",
            _raw_data_resources_adapter,
            ["molecular_characterization", "model_molchar"],
        )
        # annotation resources matching the model's molecular data
        # (ref search_index_molecular_data_transformer_job.py:83-90)
        annot_mods = [m for m in meas_mods if m in harmonisable]
        if "resource" in raw and annot_mods:
            dag.add(
                "cancer_annotation_resources",
                _annotation_resources_adapter(len(annot_mods)),
                [f"{m}_measurement_data" for m in annot_mods]
                + ["model_molchar", "raw/resource"],
            )

    # imaging cluster (image_study/model_image modules)
    if "image_study" in raw:
        dag.add("image_study", img_t.image_study, ["raw/image_study"])
    if "model_image" in raw:
        dag.add("model_image", img_t.model_image, ["raw/model_image", "initial_model"])
        dag.add("images_json_agg", _images_json_adapter, ["model_image"])

    # HGNC gene-marker reference + exploded symbol side tables
    # (gene_marker_transformer_job.py:25-46)
    if "markers" in raw:
        dag.add("gene_marker", mol_t.gene_marker, ["raw/markers"])
        dag.add("gene_marker_previous_symbols", mol_t.previous_symbols, ["gene_marker"])
        dag.add("gene_marker_alias_symbols", mol_t.alias_symbols, ["gene_marker"])

    if "obo" in raw:
        dag.add("ontology_term", ont_t.ontology_term, ["raw/obo"])
        dag.add("term_closure", ont_t.term_closure, ["raw/obo"])
        dag.add(
            "ontology_term_diagnosis",
            ont_t.ontology_term_diagnosis,
            ["ontology_term", "term_closure"],
        )
        dag.add(
            "term_ancestors", ont_t.term_ancestors, ["ontology_term", "term_closure"]
        )
        dag.add(
            "ontology_term_treatment",
            ont_t.ontology_term_treatment,
            ["ontology_term", "term_closure"],
        )
        dag.add(
            "ontology_term_regimen",
            ont_t.ontology_term_regimen,
            ["ontology_term", "term_closure"],
        )
        if "treatment_mapping" in raw and "treatment" in dag.nodes:
            dag.add(
                "treatment_name_harmonisation",
                tr_t.harmonise_treatment_names,
                ["treatment", "raw/treatment_mapping",
                 "ontology_term_treatment", "ontology_term_regimen"],
            )
        if "ontolia" in raw:
            dag.add(
                "regimen_to_treatment",
                ont_t.regimen_to_treatment,
                ["raw/ontolia", "ontology_term_regimen", "ontology_term_treatment"],
            )
        if "diagnosis_mapping" in raw and "sample" in raw:
            dag.add(
                "sample_to_ontology",
                _sample_to_ontology_adapter,
                ["patient_sample", "tissue", "tumour_type",
                 "raw/diagnosis_mapping", "ontology_term_diagnosis"],
            )
            dag.add(
                "search_index_patient_sample",
                _search_index_ps_adapter,
                ["patient_sample", "patient", "sample_to_ontology",
                 "ontology_term_diagnosis", "term_ancestors",
                 "tissue", "tumour_type", "ethnicity"],
            )
            six_deps = ["model", "search_index_patient_sample", "provider_group",
                        "project_group"]
            # per-model aggregate nodes are hoisted next to their base
            # entities so search_index and model_metadata share one
            # computation (persisted by the multi-consumer rule)
            for agg in ("dataset_available", "treatment_aggregation_by_model",
                        "qa_json_agg", "specimens_json_agg", "images_json_agg"):
                if agg in dag.nodes:
                    six_deps.append(agg)
            dag.add("publications_json_agg", _publications_json_adapter,
                    ["initial_model"])
            six_deps.append("publications_json_agg")
            # molecular per-model aggregates (marker lists, msi, hla,
            # breast-cancer biomarkers) — whichever this run produced
            for agg in ("markers_with_mutation_data", "markers_with_cna_data",
                        "markers_with_expression_data",
                        "markers_with_biomarker_data", "msi_status",
                        "hla_types", "breast_cancer_biomarkers",
                        "raw_data_resources", "cancer_annotation_resources"):
                if agg in dag.nodes:
                    six_deps.append(agg)
            # treatment-type list per model over harmonised ontology terms
            if ("treatment_name_harmonisation" in dag.nodes
                    and "treatment_component_helper" in dag.nodes):
                dag.add(
                    "custom_treatment_types",
                    _custom_treatment_types_adapter,
                    ["treatment_protocol", "treatment_component_helper",
                     "treatment_name_harmonisation", "term_ancestors"],
                )
                six_deps.append("custom_treatment_types")
            # metadata completeness scores (search_index 'scores' JSON)
            dag.add(
                "scores",
                _scores_adapter,
                ["model_metadata", "search_index_patient_sample"],
            )
            six_deps.append("scores")
            dag.add("search_index", _search_index_adapter, six_deps)
            dag.add(
                "search_facet",
                _search_facet_adapter,
                ["search_index"],
                needs_spark=True,
            )

    # lineage graph (nodes/edges entities, nodes_transformer_job.py:59-79)
    if "patient_sample" in dag.nodes:
        from pdcm_etl_spark.transforms import lineage as lin_t2

        dag.add("node", lin_t2.nodes, ["patient", "patient_sample", "model"])
        dag.add("edge", lin_t2.edges, ["node", "patient_sample", "model"])

    # model_metadata: model spine + whichever per-model aggregate nodes
    # this run's raw modules produced (each aggregate is optional, like
    # the reference's left-join chain in model_metadata_transformer_job
    # .py). The aggregates are shared DAG nodes — search_index consumes
    # the same ones, so each is computed once and persisted.
    mm_deps = ["model"] + [
        n for n in ("qa_json_agg", "specimens_json_agg", "dataset_available",
                    "images_json_agg")
        if n in dag.nodes
    ]
    dag.add("model_metadata", _model_metadata_adapter, mm_deps)
    return dag


def _model_metadata_adapter(model, *aggs):
    from pdcm_etl_spark.transforms import metadata as meta_t

    return meta_t.model_metadata(model, list(aggs))


def _resolve_molchar_model_ids(molchar, initial_model):
    """molchar rows carry the provider-external model id; resolve to the
    internal id used by every per-model aggregate."""
    from pyspark.sql import functions as F

    from pdcm_etl_spark.transforms import molecular_data as md_t

    mm = md_t.model_molchar(molchar)
    ids = F.broadcast(
        initial_model.select(
            F.col("external_model_id").alias("model_id"),
            F.col("id").alias("internal_model_id"),
        )
    )
    return (
        mm.join(ids, "model_id", "left")
        .drop("model_id")
        .withColumnRenamed("internal_model_id", "model_id")
    )


def _dataset_available_adapter(model_molchar):
    """Per-model distinct molchar types with the reference's display
    renames (model_metadata_transformer_job.py:219-231); the treatment /
    publication markers are appended row-wise in search_index."""
    from pdcm_etl_spark.transforms import metadata as meta_t

    return meta_t.dataset_available(model_molchar)


def _genes_per_model_adapter(out_col: str, symbol_col: str):
    """Sorted distinct marker list per model for one measurement type —
    feeds search_index and the models_by_mutated_gene view
    (views.sql:1113-1126)."""
    def build(md, model_molchar):
        from pdcm_etl_spark.transforms import molecular_data as md_t

        sym = symbol_col if symbol_col in md.columns else "biomarker"
        return md_t.genes_per_model(md, model_molchar, out_col, symbol_col=sym)

    return build


def _msi_adapter(imm_md, model_molchar):
    from pdcm_etl_spark.transforms import molecular_data as md_t

    return md_t.msi_status_per_model(imm_md, model_molchar)


def _hla_adapter(imm_md, model_molchar):
    from pdcm_etl_spark.transforms import molecular_data as md_t

    return md_t.hla_types_per_model(imm_md, model_molchar)


def _breast_biomarkers_adapter(bio_md, model_molchar):
    from pdcm_etl_spark.transforms import molecular_data as md_t

    return md_t.breast_cancer_biomarkers_per_model(bio_md, model_molchar)


def _raw_data_resources_adapter(molchar, model_molchar):
    from pdcm_etl_spark.transforms import links as links_t

    return links_t.raw_data_resources_per_model(molchar, model_molchar)


def _annotation_resources_adapter(n_measurements: int):
    def build(*dfs):
        from pdcm_etl_spark.transforms import links as links_t

        measurement_frames = list(dfs[:n_measurements])
        model_molchar, resources = dfs[n_measurements], dfs[n_measurements + 1]
        return links_t.cancer_annotation_resources_per_model(
            measurement_frames, model_molchar, resources
        )

    return build


def _qa_json_adapter(qa):
    from pdcm_etl_spark.transforms import metadata as meta_t

    return meta_t.quality_assurance_json(qa)


def _specimens_json_adapter(sp, hs, es, et, est, ess):
    from pdcm_etl_spark.transforms import metadata as meta_t

    return meta_t.xenograft_specimens_json(sp, hs, es, et, est, ess)


def _images_json_adapter(model_image):
    from pdcm_etl_spark.transforms import images as img_t

    return img_t.model_images_json(model_image)


def _publications_json_adapter(initial_model):
    from pdcm_etl_spark.transforms import metadata as meta_t

    return meta_t.publications_json(initial_model)


def _custom_treatment_types_adapter(protocol, helper, harmonisation, ancestors):
    from pdcm_etl_spark.transforms import links as links_t

    return links_t.custom_treatment_types_per_model(
        protocol, helper, harmonisation, ancestors
    )


def _scores_adapter(model_metadata, six_ps):
    """Join the model-metadata spine (JSON aggregates + supplier cols) to
    the patient/sample slice so the score expression sees every weighted
    column, then emit the per-model scores JSON."""
    from pdcm_etl_spark.transforms import scoring as scoring_t

    joined = model_metadata.join(six_ps, "pdcm_model_id", "left")
    return scoring_t.scores_json(joined)


def _harmonise_input(raw_df):
    """Normalize a raw measurement module for the symbol cascade: the
    biomarker module names its gene column 'biomarker' and carries no
    stable ids — add 'symbol' and null id columns so the cascade's later
    stages no-op."""
    from pyspark.sql import functions as F

    h_in = raw_df
    if "symbol" not in h_in.columns and "biomarker" in h_in.columns:
        h_in = h_in.withColumn("symbol", F.col("biomarker"))
    for id_col in ("ensembl_gene_id", "ncbi_gene_id"):
        if id_col not in h_in.columns:
            h_in = h_in.withColumn(id_col, F.lit(None).cast("string"))
    return h_in


def _harmonised_union_adapter(mods: list[str]):
    """Tagged union of every harmonisable raw module -> one cascade run.
    All raw module frames are all-string (TSV contract), so
    unionByName(allowMissingColumns=True) never hits a type conflict;
    columns a module lacks come back null and are dropped again by the
    per-module slice."""

    def build(*dfs):
        from functools import reduce

        from pyspark.sql import functions as F

        from pdcm_etl_spark.transforms import molecular as mol_t

        raws, (gene_marker, prev_syms, alias_syms) = dfs[:len(mods)], dfs[len(mods):]
        tagged = [
            _harmonise_input(raw).withColumn("__mtype", F.lit(mod))
            for mod, raw in zip(mods, raws)
        ]
        unioned = reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), tagged
        )
        return mol_t.harmonise_marker_symbols(
            unioned, gene_marker, prev_syms, alias_syms
        )

    return build


def _measurement_slice_adapter(mod: str):
    """Slice one module back out of the shared cascade result: filter the
    tag, restore the module's exact pre-cascade column order (hash_id is
    order-sensitive — ids must match the per-module cascade path), then
    build the measurement table."""

    def build(harmonised_all, raw_df, molchar):
        from pyspark.sql import functions as F

        from pdcm_etl_spark.transforms import molecular_data as md_t

        h_in_cols = list(_harmonise_input(raw_df).columns)
        # exact per-module cascade column order (hash_id is
        # order-sensitive): the cascade's final join(on="gene_marker_id")
        # hoists the key to the front, then the input columns, then the
        # appended result columns
        sliced = harmonised_all.filter(F.col("__mtype") == mod).select(
            "gene_marker_id",
            *h_in_cols,
            "non_harmonised_symbol",
            "harmonisation_result",
            "hgnc_symbol",
        )
        return md_t.measurement_data(raw_df, molchar, harmonised=sliced)

    return build


def _measurement_adapter(raw_df, molchar, gene_marker=None, prev_syms=None,
                         alias_syms=None):
    """Measurement table builder; when the HGNC reference tables are
    wired in, rows go through the 5-stage symbol-harmonisation cascade
    first so the table carries hgnc_symbol / non_harmonised_symbol /
    harmonisation_result (the columns every *_data_table view exposes,
    views.sql:363-404)."""
    from pdcm_etl_spark.transforms import molecular as mol_t
    from pdcm_etl_spark.transforms import molecular_data as md_t

    harmonised = None
    if gene_marker is not None:
        from pyspark.sql import functions as F

        h_in = raw_df
        # biomarker module names its gene column 'biomarker' and carries
        # no stable ids — normalize so the cascade's later stages no-op
        if "symbol" not in h_in.columns and "biomarker" in h_in.columns:
            h_in = h_in.withColumn("symbol", F.col("biomarker"))
        for id_col in ("ensembl_gene_id", "ncbi_gene_id"):
            if id_col not in h_in.columns:
                h_in = h_in.withColumn(id_col, F.lit(None).cast("string"))
        harmonised = mol_t.harmonise_marker_symbols(
            h_in, gene_marker, prev_syms, alias_syms
        )
    return md_t.measurement_data(raw_df, molchar, harmonised=harmonised)


def _available_columns_adapter(mod_names: list[str]):
    def build(*dfs):
        from pdcm_etl_spark.transforms import profile as profile_t

        return profile_t.available_columns_all(dict(zip(mod_names, dfs)))

    return build


def _search_facet_adapter(spark, search_index_df):
    from pdcm_etl_spark.transforms import facets as facets_t

    return facets_t.search_facets(spark, search_index_df)


def _search_index_adapter(model, six_ps, provider_group, project_group, *aggs):
    from pdcm_etl_spark.transforms import search as search_t

    return search_t.search_index(
        model, six_ps, list(aggs),
        provider_group_df=provider_group, project_group_df=project_group,
    )


def _sample_to_ontology_adapter(
    patient_sample, tissue, tumour_type, diagnosis_mapping, diag_terms
):
    """Resolve the sample's tissue/tumour-type FKs back to display names
    and run the 4-key ontology mapping (sample_to_ontology_transformer_job
    .py:96-139). The internal patient_sample id is the sample key used by
    search_index_patient_sample."""
    from pyspark.sql import functions as F

    from pdcm_etl_spark.transforms import ontology as ont_t

    t_primary = F.broadcast(
        tissue.select(
            F.col("id").alias("primary_site_id"), F.col("name").alias("primary_tissue")
        )
    )
    tt = F.broadcast(
        tumour_type.select(
            F.col("id").alias("tumour_type_id"), F.col("name").alias("tumor_type")
        )
    )
    sample_data = (
        patient_sample.select(
            F.col("id").alias("sample_id"),
            F.col("data_source_tmp").alias("data_source"),
            "diagnosis",
            "primary_site_id",
            "tumour_type_id",
        )
        .join(t_primary, "primary_site_id", "left")
        .join(tt, "tumour_type_id", "left")
    )
    return ont_t.sample_to_ontology(sample_data, diagnosis_mapping, diag_terms)


def _search_index_ps_adapter(
    patient_sample, patient, s2o, diag_terms, ancestors, tissue, tumour_type, ethnicity
):
    from pyspark.sql import functions as F

    from pdcm_etl_spark.transforms import search as search_t

    terms_with_anc = diag_terms.join(
        ancestors.withColumnRenamed("term_id", "a_term_id"),
        diag_terms.term_id == F.col("a_term_id"),
        "left",
    ).drop("a_term_id")
    return search_t.search_index_patient_sample(
        patient_sample, patient, s2o, terms_with_anc,
        tissue_df=tissue, tumour_type_df=tumour_type, ethnicity_df=ethnicity,
    )
