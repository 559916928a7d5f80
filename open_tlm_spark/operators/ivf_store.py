"""Persisted IVF index: train once, serve top-k forever after.

VERDICT r7 #5b: `sim_ivf_topk` recomputes the corpus cell assignment
on every call — fine for a gate query, wrong for a serving path. A
real ANN deployment trains centroids once, materializes the cell
assignment as a parquet artifact PARTITIONED BY CELL, and every
subsequent query probes only its cell's files. This module is the
serving-path analog of the band store in
`streaming/incremental_dedup.py`: the index outlives the session, and
reloads serve without retraining.

Scale (100 TB): the assignments table is the corpus (vec_id, cell,
normalized vector) written `partitionBy(centroid_id, epoch)` (epoch 0
= the base build; intakes own epochs > 0 and are idempotent per
epoch) — a probe with nprobe=1 reads 1/n_cells of the files via
partition pruning (the
`PartitionFilters` line in the scan, plan-pinned in
tests/test_ivf_store.py), and the per-query join is a broadcast of the
tiny query frame against one cell's rows. Centroids are k rows —
broadcast by construction. Retraining cost is paid exactly once per
corpus version.

Equivalence contract: serving from the store returns byte-identical
results to the direct `ivf_topk` computation (same normalization, same
rounding, same tiebreaks; parquet round-trips doubles exactly) —
proven by tests/test_ivf_store.py::test_store_matches_direct_topk and
gated end-to-end by the `sim_ivf_persisted_topk` registry query
against the same DuckDB oracle as `sim_ivf_topk`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_tlm_spark.operators.similarity import (
    as_double,
    dot,
    ivf_assign_slim,
    kmeans_train,
    normalized,
)

CENTROIDS_SCHEMA = "centroid_id bigint, cvec array<double>"
ASSIGN_SCHEMA = (
    "vec_id bigint, nvec array<double>, centroid_id bigint, epoch bigint"
)


class IVFIndex:
    """Parquet-backed IVF index under `path`:

    * ``centroids/``   — (centroid_id, cvec): the trained centroids.
    * ``assignments/`` — (vec_id, nvec) partitioned by
      (centroid_id, epoch): every corpus vector, L2-normalized, in
      its cell's partition; epoch 0 is the build, intakes append
      their own epochs (compact_epochs folds them back).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.centroids_path = os.path.join(path, "centroids")
        self.assignments_path = os.path.join(path, "assignments")

    # ------------------------------------------------------------ build
    @classmethod
    def build(
        cls,
        spark: SparkSession,
        embeddings: DataFrame,
        path: str,
        k: int = 8,
        iters: int = 2,
        dim: int = 64,
        centroids: DataFrame | None = None,
    ) -> "IVFIndex":
        """Train (unless `centroids` is given), assign, persist.

        Runs actions (kmeans iterations + two writes) — build is
        pipeline-side, like the CC loop. Pass `centroids` to skip
        training (e.g. the gate query's deterministic lowest-vec_id
        centroids, so the DuckDB oracle can reproduce them)."""
        idx = cls(spark, path)
        if centroids is None:
            centroids = kmeans_train(
                embeddings, k=k, iters=iters, dim=dim
            ).select("centroid_id", F.col("cnvec").alias("cvec"))
        cents = centroids.select("centroid_id", "cvec")
        cents.coalesce(1).write.mode("overwrite").parquet(
            idx.centroids_path
        )
        stored_cents = idx.centroids()
        # ivf_assign_slim: scalar argmax state + nvec rejoin — the
        # build-shaped assign (see its docstring for the profile)
        assigned = ivf_assign_slim(
            embeddings, stored_cents, dim=dim
        ).select(
            "vec_id", "nvec", "centroid_id", F.lit(0).cast("long").alias("epoch")
        )
        # STATIC overwrite: a rebuild truncates the whole table (a
        # dynamic overwrite here would leave stale partitions from a
        # previous, larger index lingering). Pinned per-write — the
        # truncate semantics must not depend on the session default
        # (a session configured with dynamic overwrite globally would
        # otherwise leave a smaller rebuild serving stale cells).
        (
            assigned.write.mode("overwrite")
            .partitionBy("centroid_id", "epoch")
            .option("partitionOverwriteMode", "static")
            .parquet(idx.assignments_path)
        )
        return idx

    def exists(self) -> bool:
        return os.path.exists(self.centroids_path) and os.path.exists(
            self.assignments_path
        )

    def add(self, embeddings: DataFrame, dim: int = 64, epoch: int = 1) -> None:
        """Incremental corpus intake: assign NEW vectors to the
        EXISTING centroids and land them in their cell partitions —
        the serving analog of the incremental-dedup band store. No
        retraining, no rewrite of existing cells or earlier epochs.
        Centroid drift under sustained intake is a rebuild decision
        (compare cell-size balance via
        `assignments().groupBy("centroid_id").count()`), not
        something hidden here.

        IDEMPOTENT per (intake, epoch): the table is partitioned by
        (centroid_id, epoch) and the write uses DYNAMIC partition
        overwrite, so re-running the same intake batch REPLACES its
        own epoch partitions with identical deterministic content
        instead of appending a second copy — the same crash-replay
        contract as the incremental-dedup band store. Callers must
        give distinct intakes distinct epochs > 0 (the build owns
        epoch 0); two DIFFERENT doc sets written under one epoch
        overwrite each other by design."""
        assert epoch > 0, "epoch 0 belongs to the base build"
        assigned = ivf_assign_slim(
            embeddings, self.centroids(), dim=dim
        ).select(
            "vec_id",
            "nvec",
            "centroid_id",
            F.lit(epoch).cast("long").alias("epoch"),
        )
        (
            assigned.write.mode("overwrite")
            .partitionBy("centroid_id", "epoch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.assignments_path)
        )

    def compact_epochs(self) -> int:
        """Fold every intake epoch back into epoch 0: continuous
        intake accretes one (cell, epoch) leaf per intake per touched
        cell, and both the file count and the delete-rewrite predicate
        grow with the epoch count. Compaction is one read + one STATIC
        truncate-overwrite (the same shape as TelemetryStore.compact):
        run it on the maintenance cadence, not per intake. The eager
        checkpoint cuts the read-overwrite cycle on the path. Returns
        the row count of the compacted table."""
        table = (
            self.assignments()
            .select(
                "vec_id",
                "nvec",
                "centroid_id",
                F.lit(0).cast("long").alias("epoch"),
            )
            .localCheckpoint(eager=True)
        )
        n = table.count()
        # STATIC pin for the same reason as build(): under a session
        # configured with dynamic overwrite, this truncate would only
        # replace the epoch=0 partitions and leave every intake epoch
        # on disk — every compacted row served twice.
        (
            table.write.mode("overwrite")
            .partitionBy("centroid_id", "epoch")
            .option("partitionOverwriteMode", "static")
            .parquet(self.assignments_path)
        )
        self.spark.catalog.refreshByPath(self.assignments_path)
        return n

    def delete(self, vec_ids: list[int]) -> int:
        """Privacy-delete propagation into the SERVING artifact: a
        right-to-be-forgotten request is not done when the corpus row
        dies — every derived artifact that can reproduce the vector
        must drop it too. Rewrites only the (cell, epoch) partitions
        that contain the ids; untouched cells keep their files.
        Returns rows removed."""
        return _delete_rows(
            self.spark,
            self.assignments_path,
            ASSIGN_SCHEMA,
            vec_ids,
            ["centroid_id", "epoch"],
        )

    # ------------------------------------------------------------- read
    def centroids(self) -> DataFrame:
        return self.spark.read.schema(CENTROIDS_SCHEMA).parquet(
            self.centroids_path
        )

    def assignments(self) -> DataFrame:
        return self.spark.read.schema(ASSIGN_SCHEMA).parquet(
            self.assignments_path
        )

    # ------------------------------------------------------------ serve
    def _route_queries(
        self, queries: DataFrame, dim: int | None = None, nprobe: int = 1
    ) -> DataFrame:
        """(query_id, qcell, qvec): assign each query to its nprobe
        nearest cells via the stored centroids (one row per
        query x probed cell) — inlined WITHOUT the lineage cut
        `ivf_assign` applies to corpus-sized inputs (the query frame
        is tiny, and a `localCheckpoint` here would hide the selective
        predicate from the dynamic-partition-pruning rule and silently
        degrade every probe to a full-corpus scan). nprobe=1 keeps the
        deterministic argmax tiebreak of `similarity.ivf_assign`;
        nprobe>1 ranks cells by (rounded cos desc, centroid_id asc)."""
        cents = normalized(
            self.centroids().select(
                "centroid_id", as_double(F.col("cvec")).alias("vec")
            ),
            "vec",
            dim=dim,
        ).select("centroid_id", F.col("nvec").alias("cnvec"))
        qn = normalized(
            queries.select(
                "query_id", as_double(F.col("query_vec")).alias("vec")
            ),
            "vec",
            dim=dim,
        )
        qscored = qn.join(F.broadcast(cents)).select(
            "query_id",
            F.col("nvec").alias("qv"),
            "centroid_id",
            F.round(dot(F.col("nvec"), F.col("cnvec"), dim), 6).alias("cs"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cs").desc(), "centroid_id"
        )
        return (
            qscored.withColumn("_cr", F.row_number().over(w))
            .filter(F.col("_cr") <= nprobe)
            .select(
                "query_id",
                F.col("centroid_id").alias("qcell"),
                F.col("qv").alias("qvec"),
            )
        )

    def topk(
        self,
        queries: DataFrame,
        k: int = 5,
        dim: int | None = None,
        nprobe: int = 1,
    ) -> DataFrame:
        """IVF top-k from the persisted artifacts — NO retraining, no
        corpus re-assignment: queries route to their nprobe nearest
        cells via the stored centroids (broadcast), then probe only
        those cells' partitions of the stored assignments. nprobe is
        the serve-time recall knob: each extra probe adds one cell's
        rows to the scan (still pruned — the cell subquery carries
        every probed cell). Same math/tiebreaks as
        `similarity.ivf_topk` (operators/similarity.py:332), so the
        results are identical; that tail is restated here rather than
        imported so the serving path depends only on the artifacts,
        not on the corpus frame.

        queries: (query_id, query_vec). Lazy — safe for registered
        builders once the index exists.

        The query-side cell assignment is inlined WITHOUT the lineage
        cut `ivf_assign` applies to corpus-sized inputs: the query
        frame is tiny (the cut buys nothing), and keeping its filters
        visible to the optimizer is what lets the DYNAMIC PARTITION
        PRUNING rule inject the cell subquery into the assignments
        scan (a `localCheckpoint` hides the selective predicate and
        silently degrades the probe to a full-corpus scan — found by
        reading the plan, pinned by the pruning test)."""
        q = self._route_queries(queries, dim=dim, nprobe=nprobe)
        scored = self.assignments().join(
            F.broadcast(q),
            (F.col("centroid_id") == F.col("qcell"))
            & (F.col("vec_id") != F.col("query_id")),
        ).select(
            "query_id",
            "vec_id",
            # dim-UNROLLED dot: on this simple scan->join->project
            # stage the 64-term chain JIT-compiles and runs ~1us/row;
            # the HOF fold measured ~35us/row here (interpreted
            # lambda per element). The opposite holds in the build's
            # fused assign stage — see ivf_assign_slim.
            F.round(dot(F.col("qvec"), F.col("nvec"), dim), 6).alias(
                "cos_sim"
            ),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), "vec_id"
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", "cos_sim", "rank")
        )


PQ_CODES_SCHEMA = (
    "vec_id bigint, sub int, code int, centroid_id bigint, epoch bigint"
)
PQ_CODEBOOK_SCHEMA = "sub int, code_id int, cv array<double>"


class IVFPQIndex(IVFIndex):
    """Persisted IVF + product quantization (Jégou et al. 2011 — the
    public IVFADC construction): the serving artifact stores m small
    integer CODES per vector instead of the full vector, plus an
    m-subspace codebook. At dim=64 float64 that is ~8 bytes of code
    against 512 bytes of vector — the 100 TB-corpus shape where the
    probe scans codes and reconstructs distances from a broadcast
    lookup table (ADC), never touching raw vectors.

    Artifacts under `path`:
      * ``centroids/``   — inherited: coarse cells for routing.
      * ``pq_codebook/`` — (sub, code_id, cv): ks codewords per
        subspace over the NORMALIZED vectors. Default: the
        deterministic ks-lowest-vec_ids convention the `pq_quantize`
        gate pins against DuckDB; pass ``train_iters > 0`` for
        per-subspace Lloyd k-means seeded from that same convention
        (the Jégou et al. 2011 training step — tighter codewords,
        same artifact shape).
      * ``pq_codes/``    — (vec_id, sub, code) partitioned by
        (centroid_id, epoch), mirroring the flat index's assignments
        layout: long-form codes, m rows per vector, so the ADC probe
        is a plain equi-join (no per-row array explode), cell pruning
        works exactly as in the flat index, and incremental intake
        (`add`) owns epochs > 0 idempotently.

    Ranking is by ADC squared-L2 over normalized vectors (monotone in
    cosine: ||a-b||^2 = 2 - 2 cos); ties break on vec_id. Exactness is
    numpy-pinned in tests/test_ivf_store.py; recall vs the flat index
    is the quality knob (m, ks, train_iters), not a correctness
    property. The gate embeddings are PQ's WORST case (unit-random, no
    cluster structure for codewords to exploit): with the deterministic
    codebook, measured recall@5 vs flat is 0.23 at ks=8 and 0.43 at
    the ks=32 default; trained codebooks raise it (0.385 -> 0.47 on
    40 gate queries, pinned in tests/test_ivf_store.py) and the
    serving default at scale is ADC top-r + exact re-rank
    (`topk_rerank`), which returns recall to near-flat while fetching
    only r raw vectors per query. Residual encoding (IVFADC's classic
    x - c_cell transform) was measured and NOT adopted: with this
    index's deterministic corpus-point coarse centroids the residuals
    are as wide as the vectors and recall drops on every corpus shape
    tried (0.48 -> 0.415 on the gate vectors; far worse on clustered
    synthetics — see tools/pq_recall_smoke.py); it only pays with a
    trained coarse quantizer, which the `pq_quantize` oracle
    convention deliberately avoids.
    """

    def __init__(self, spark: SparkSession, path: str):
        super().__init__(spark, path)
        self.codebook_path = os.path.join(path, "pq_codebook")
        self.codes_path = os.path.join(path, "pq_codes")

    # -- small local helpers (slice + left-associated squared L2: the
    # -- same op order the pq_quantize oracle fixes, so distances are
    # -- bit-reproducible across engines)
    @staticmethod
    def _subspaces(frame: DataFrame, vec_col: str, out: str, m: int, dsub: int) -> DataFrame:
        structs = F.array(
            *[
                F.struct(
                    F.lit(s).alias("sub"),
                    F.slice(vec_col, s * dsub + 1, dsub).alias("sv"),
                )
                for s in range(m)
            ]
        )
        keep = [c for c in frame.columns if c != vec_col]
        return frame.select(*keep, F.explode(structs).alias("_e")).select(
            *keep, F.col("_e.sub").alias("sub"), F.col("_e.sv").alias(out)
        )

    @staticmethod
    def _sqdist(a: str, b: str, dsub: int) -> "F.Column":
        terms = [
            (F.element_at(a, j + 1) - F.element_at(b, j + 1))
            * (F.element_at(a, j + 1) - F.element_at(b, j + 1))
            for j in range(dsub)
        ]
        d = terms[0]
        for t in terms[1:]:
            d = d + t
        return d

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        embeddings: DataFrame,
        path: str,
        k: int = 8,
        iters: int = 2,
        dim: int = 64,
        centroids: DataFrame | None = None,
        m: int = 8,
        ks: int = 32,
        codebook: DataFrame | None = None,
        train_iters: int = 0,
    ) -> "IVFPQIndex":
        """Route every vector to its cell, quantize it to m codes, and
        persist centroids + codebook + cell-partitioned codes. Unlike
        the flat build, raw/normalized vectors are NOT stored — the
        codes ARE the corpus artifact.

        Codebook precedence: an explicit `codebook` frame (sub,
        code_id, cv) wins (the PQ analog of passing `centroids` — lets
        an incremental build share a full build's codebook);
        `train_iters > 0` runs per-subspace Lloyd k-means seeded from
        the deterministic convention; otherwise the deterministic
        ks-lowest-vec_ids convention alone."""
        assert dim % m == 0, "dim must split evenly into m subspaces"
        # The per-(vector, subspace) argmin packs code_id into the two
        # low decimal digits of an integer key (dist_key * 100 +
        # code_id); ks >= 100 would overflow code_id into the distance
        # component and silently corrupt codes. (An inlined
        # literal-expression argmin was tried instead of the codebook
        # join: the m x ks x dsub expression tree falls out of
        # whole-stage codegen and runs interpreted, ~50x slower at 1M
        # vectors — the join + map-side-combined min() IS the fast
        # shape here.)
        assert ks < 100, "ks must stay below the integer-key radix (100)"
        dsub = dim // m
        idx = cls(spark, path)
        if centroids is None:
            centroids = kmeans_train(
                embeddings, k=k, iters=iters, dim=dim
            ).select("centroid_id", F.col("cnvec").alias("cvec"))
        centroids.select("centroid_id", "cvec").coalesce(1).write.mode(
            "overwrite"
        ).parquet(idx.centroids_path)

        # Eager cut: the PQ build re-reads `assigned` for the
        # codebook take, each training iteration, and the encode
        # write — without the checkpoint every action re-runs the
        # corpus x k assignment join.
        assigned = (
            ivf_assign_slim(embeddings, idx.centroids(), dim=dim)
            .select("vec_id", "nvec", "centroid_id")
            .localCheckpoint(eager=True)
        )

        if codebook is None:
            # deterministic codebook: ks lowest vec_ids' normalized
            # subvectors (the pq_quantize gate convention), optionally
            # refined by per-subspace Lloyd iterations
            w = Window.orderBy("vec_id")
            cb_rows = (
                assigned.orderBy("vec_id")
                .limit(ks)
                .select(
                    (F.row_number().over(w) - 1).alias("code_id"),
                    F.col("nvec").alias("vec"),
                )
            )
            codebook = cls._subspaces(cb_rows, "vec", "cv", m, dsub).select(
                "sub", "code_id", "cv"
            )
            if train_iters > 0:
                codebook = cls._train_codebook(
                    assigned, codebook, m, dsub, train_iters
                )
        codebook.select("sub", "code_id", "cv").coalesce(1).write.mode(
            "overwrite"
        ).parquet(idx.codebook_path)

        codes = idx._encode(assigned, m, dsub, epoch=0)
        # STATIC pin: a rebuild must truncate every cell/epoch of a
        # previous index, independent of the session overwrite default.
        (
            codes.write.mode("overwrite")
            .partitionBy("centroid_id", "epoch")
            .option("partitionOverwriteMode", "static")
            .parquet(idx.codes_path)
        )
        return idx

    @staticmethod
    def _train_codebook(
        assigned: DataFrame,
        init: DataFrame,
        m: int,
        dsub: int,
        iters: int,
    ) -> DataFrame:
        """Per-subspace Lloyd k-means over the corpus subvectors
        (Jégou et al. 2011 §II.C — each subquantizer is an independent
        k-means in its dsub-dim slice). Same driver-loop shape as
        `similarity.kmeans_train`: each iteration broadcasts the tiny
        (m x ks)-row codebook into the subvector frame, assigns by the
        deterministic integer-key argmin, recomputes codewords as
        element-wise means, and eagerly checkpoints the m x ks result
        so plans don't nest. Codewords that attract no subvectors keep
        their previous value (the deterministic empty-cluster rule).
        At 100 TB this trains on a sample, exactly like the coarse
        quantizer."""
        vsub = IVFPQIndex._subspaces(
            assigned.select("vec_id", F.col("nvec").alias("vec")),
            "vec",
            "sv",
            m,
            dsub,
        ).localCheckpoint(eager=False)
        cb = init.localCheckpoint(eager=True)
        ikey = (
            F.round(
                F.round(IVFPQIndex._sqdist("sv", "cv", dsub), 6) * 1_000_000
            ).cast("long")
            * 100
            + F.col("code_id")
        )
        for _ in range(iters):
            hit = (
                vsub.join(F.broadcast(cb), "sub")
                .select("vec_id", "sub", "sv", ikey.alias("ikey"))
                .groupBy("vec_id", "sub")
                .agg(
                    (F.min("ikey") % 100).cast("int").alias("code_id"),
                    F.first("sv").alias("sv"),
                )
            )
            mean_sv = F.array(
                *[F.avg(F.element_at("sv", j + 1)) for j in range(dsub)]
            )
            updated = hit.groupBy("sub", "code_id").agg(
                mean_sv.alias("new_cv")
            )
            cb = (
                cb.join(updated, ["sub", "code_id"], "left")
                .select(
                    "sub",
                    "code_id",
                    F.coalesce("new_cv", "cv").alias("cv"),
                )
                .localCheckpoint(eager=True)
            )
        return cb

    def _encode(
        self, assigned: DataFrame, m: int, dsub: int, epoch: int
    ) -> DataFrame:
        """(vec_id, sub, code, centroid_id, epoch): quantize each
        routed, normalized vector against the PERSISTED codebook via
        the per-(vector, subspace) integer-key argmin —
        round(dist,6)*1e6*100 + code_id, so min() is deterministic
        (distance dominates; code_id breaks ties low-first). Shared by
        build (epoch 0) and add (intake epochs)."""
        vsub = self._subspaces(
            assigned.select(
                "vec_id", "centroid_id", F.col("nvec").alias("vec")
            ),
            "vec",
            "sv",
            m,
            dsub,
        )
        ikey = (
            F.round(
                F.round(self._sqdist("sv", "cv", dsub), 6) * 1_000_000
            ).cast("long")
            * 100
            + F.col("code_id")
        )
        return (
            vsub.join(F.broadcast(self.codebook()), "sub")
            .select("vec_id", "centroid_id", "sub", ikey.alias("ikey"))
            .groupBy("vec_id", "centroid_id", "sub")
            .agg((F.min("ikey") % 100).cast("int").alias("code"))
            .select(
                "vec_id",
                "sub",
                "code",
                "centroid_id",
                F.lit(epoch).cast("long").alias("epoch"),
            )
        )

    def add(self, embeddings: DataFrame, dim: int = 64, epoch: int = 1) -> None:
        """Incremental intake for the COMPRESSED artifact: assign new
        vectors to the existing centroids, quantize them against the
        existing codebook, and land their code rows in their (cell,
        epoch) partitions — the PQ twin of `IVFIndex.add`, overridden
        because the inherited version would write `assignments/`,
        which PQ serving never reads (the intaken vectors would
        silently never be served). Same idempotency contract: dynamic
        partition overwrite per (intake, epoch), epoch 0 belongs to
        the build. Codebook drift under sustained intake is a rebuild
        decision, like centroid drift."""
        assert epoch > 0, "epoch 0 belongs to the base build"
        m, dsub = self._shape()
        assigned = ivf_assign_slim(
            embeddings, self.centroids(), dim=dim
        ).select("vec_id", "nvec", "centroid_id")
        (
            self._encode(assigned, m, dsub, epoch=epoch)
            .write.mode("overwrite")
            .partitionBy("centroid_id", "epoch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.codes_path)
        )

    def compact_epochs(self) -> int:
        """Fold every intake epoch of the CODES table back into epoch
        0 — overridden from the flat index, which compacts
        `assignments/` (a directory a PQ-only build never creates).
        One read + one static truncate-overwrite; returns the code-row
        count (m x vectors)."""
        table = (
            self.codes()
            .select(
                "vec_id",
                "sub",
                "code",
                "centroid_id",
                F.lit(0).cast("long").alias("epoch"),
            )
            .localCheckpoint(eager=True)
        )
        n = table.count()
        (
            table.write.mode("overwrite")
            .partitionBy("centroid_id", "epoch")
            .option("partitionOverwriteMode", "static")
            .parquet(self.codes_path)
        )
        self.spark.catalog.refreshByPath(self.codes_path)
        return n

    def exists(self) -> bool:
        return all(
            os.path.exists(p)
            for p in (self.centroids_path, self.codebook_path, self.codes_path)
        )

    def codebook(self) -> DataFrame:
        return self.spark.read.schema(PQ_CODEBOOK_SCHEMA).parquet(
            self.codebook_path
        )

    def codes(self) -> DataFrame:
        return self.spark.read.schema(PQ_CODES_SCHEMA).parquet(
            self.codes_path
        )

    def topk(
        self,
        queries: DataFrame,
        k: int = 5,
        dim: int | None = None,
        nprobe: int = 1,
    ) -> DataFrame:
        """ADC top-k from the compressed artifacts: route the query to
        its nprobe nearest cells, build the tiny m x ks lookup table
        of exact query-subvector-to-codeword distances (broadcast),
        and score the probed cells' code rows by summing the LUT
        entries each code selects — DECIMAL sums so the result is order-independent.
        The codes scan carries the cell subquery in PartitionFilters
        (same dynamic pruning as the flat index); per-query I/O is
        |cell| x m code rows, never a raw vector."""
        cb = self.codebook()
        m, dsub = self._shape()
        q = self._route_queries(queries, dim=dim, nprobe=nprobe)
        qsub = self._subspaces(
            q.select("query_id", "qcell", F.col("qvec").alias("vec")),
            "vec",
            "qv",
            m,
            dsub,
        )
        lut = qsub.join(F.broadcast(cb), "sub").select(
            "query_id",
            "qcell",
            "sub",
            "code_id",
            F.round(self._sqdist("qv", "cv", dsub), 6)
            .cast("decimal(18,6)")
            .alias("d"),
        )
        c = self.codes()
        sc = (
            c.join(
                F.broadcast(lut),
                (c.centroid_id == lut.qcell)
                & (c.sub == lut.sub)
                & (c.code == lut.code_id)
                & (c.vec_id != lut.query_id),
            )
            .groupBy("query_id", "vec_id")
            .agg(F.sum("d").alias("dist"))
        )
        w = Window.partitionBy("query_id").orderBy("dist", "vec_id")
        return (
            sc.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                "vec_id",
                F.col("dist").cast("double").alias("adc_dist"),
                "rank",
            )
        )

    def delete(self, vec_ids: list[int]) -> int:
        """Delete propagation for the compressed artifact: drops the
        ids' CODE rows (m per vector) from their cell partitions —
        codes reconstruct distances to the deleted vector, so they are
        personal data the same way the raw vector is. Returns code
        rows removed (m x vectors)."""
        return _delete_rows(
            self.spark,
            self.codes_path,
            PQ_CODES_SCHEMA,
            vec_ids,
            ["centroid_id", "epoch"],
        )

    def _shape(self) -> tuple[int, int]:
        """(m, dsub) read once from the codebook artifact and memoized
        on the handle — one tiny driver round-trip per index, not per
        query."""
        if not hasattr(self, "_shape_cache"):
            row = self.codebook().agg(
                (F.max("sub") + 1).alias("m"), F.max(F.size("cv")).alias("d")
            ).first()
            self._shape_cache = (int(row.m), int(row.d))
        return self._shape_cache


def topk_rerank(
    pq: IVFPQIndex,
    flat: IVFIndex,
    queries: DataFrame,
    k: int = 5,
    r: int = 50,
    dim: int | None = None,
    nprobe: int = 1,
) -> DataFrame:
    """IVFADC + refine (Jégou et al. 2011 §V): the PQ codes produce a
    cheap candidate set (ADC top-r, scanning bytes), then ONLY those r
    ids fetch their exact normalized vectors from the flat artifact
    for an exact-cosine re-rank. Per-query vector I/O drops from
    |cell| vectors to r vectors while recall returns to near-flat —
    the standard serving compromise when the corpus no longer fits
    the budget uncompressed.

    The candidate-id join is an equi-join on vec_id against the
    cell-partitioned flat assignments; the candidate frame is
    queries x r rows — broadcast by construction. `nprobe` widens the
    CANDIDATE search to more cells (the same recall knob as the raw
    paths); the exact re-rank step is cell-independent, so with
    nprobe = n_cells and r >= |corpus| the refine is exactly brute
    force (pinned in tests/test_ivf_store.py)."""
    cand = pq.topk(queries, k=r, dim=dim, nprobe=nprobe).select(
        "query_id", "vec_id"
    )
    q = flat._route_queries(queries, dim=dim).select("query_id", "qvec")
    exact = (
        flat.assignments()
        .join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            # dim-UNROLLED dot: on this simple scan->join->project
            # stage the 64-term chain JIT-compiles and runs ~1us/row;
            # the HOF fold measured ~35us/row here (interpreted
            # lambda per element). The opposite holds in the build's
            # fused assign stage — see ivf_assign_slim.
            F.round(dot(F.col("qvec"), F.col("nvec"), dim), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), "vec_id"
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def _delete_rows(
    spark: SparkSession,
    path: str,
    schema: str,
    vec_ids: list[int],
    partition_cols: list[str],
) -> int:
    """Targeted delete from a partitioned parquet artifact: rewrite
    ONLY the partitions that contain the ids (dynamic partition
    overwrite), and drop partitions the delete empties entirely
    (dynamic overwrite writes nothing for an empty partition, which
    would otherwise leave the deleted rows lingering — on an object
    store this step is the same targeted prefix delete). Returns the
    number of rows removed."""
    import shutil

    ids = spark.createDataFrame(
        [(int(v),) for v in vec_ids], "vec_id bigint"
    )
    table = spark.read.schema(schema).parquet(path)
    hit = table.join(F.broadcast(ids), "vec_id")
    affected = [
        tuple(r[c] for c in partition_cols)
        for r in hit.select(*partition_cols).distinct().collect()
    ]
    if not affected:
        return 0
    n_removed = hit.count()
    # A literal OR-chain over the affected (partition-col) combos so
    # the rewrite scan prunes STATICALLY (a semi-join would need
    # runtime DPP). Bounded by n_cells x n_epochs, not by |vec_ids| —
    # keep epochs compacted if intakes are very frequent.
    part_pred = None
    for combo in affected:
        pred = F.lit(True)
        for c, v in zip(partition_cols, combo):
            pred = pred & (F.col(c) == F.lit(v))
        part_pred = pred if part_pred is None else (part_pred | pred)
    # The rewrite READS the same path it overwrites — cut the lineage
    # with an eager checkpoint (materializes only the affected
    # partitions' survivors) before the write, or the overwrite would
    # consume its own partially-rewritten input.
    remaining = (
        table.filter(part_pred)
        .join(F.broadcast(ids), "vec_id", "left_anti")
        .localCheckpoint(eager=True)
    )
    (
        remaining.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )
    # Partitions emptied by the delete got NO rewrite (dynamic
    # overwrite writes nothing for an empty partition), so their old
    # files still sit on disk — drop them. Emptiness is decided from
    # the checkpointed survivor DATA, not from re-reading the path
    # (the old files would make every partition look alive).
    survivors = {
        tuple(r[c] for c in partition_cols)
        for r in remaining.select(*partition_cols).distinct().collect()
    }
    for combo in affected:
        if combo not in survivors:
            leaf = os.path.join(
                path,
                *[f"{c}={v}" for c, v in zip(partition_cols, combo)],
            )
            shutil.rmtree(leaf, ignore_errors=True)
    spark.catalog.refreshByPath(path)
    return n_removed
