"""Near-duplicate detection and similarity search, shuffle-native.

Four families (the classic training-data-pipeline quartet):

* **MinHash + LSH** — k-permutation MinHash signatures over 3-word
  shingles, b x r banding, band-bucket self-join for candidate pairs,
  signature-estimated Jaccard, min-id cluster keep.  Never all-pairs: the
  only join is an equi-join on (band_id, band_key), so candidate
  generation shuffles O(docs x bands) small rows and AQE handles hot
  buckets (boilerplate).  At 100 TB you run exact dedup first so identical
  texts don't quadratically inflate one bucket.
* **SimHash** — 32-bit sign-of-weighted-bit-sums fingerprint; near-dup
  pairs via 4 x 8-bit band blocking + Hamming distance.
* **n-gram Jaccard** — exact shingle-set Jaccard, evaluated only on LSH
  candidate pairs (re-rank step).
* **Embedding cosine** — exact top-k over a broadcast query set, plus a
  random-hyperplane LSH bucketed ANN path that joins on bucket.

Everything is JVM-side Column expressions (md5/conv/transform/aggregate)
— no Python on executors.  Every constant below is the single source of
truth shared with the DuckDB oracle generators at the bottom of this
module, so both engines compute literally the same pipeline.

Reference parity note: the reference crate has no similarity operators
(it is six aggregate UDFs, see SURVEY.md); this module is part of the
driver-mandated training-data-pipeline extras.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import bind_once, normalize_text, word_shingles, tokens
from ..functions.rounding import r6n, r6n_sql
from ..sources.catalog import widen_for_compute

# ---------------------------------------------------------------------------
# shared deterministic constants (Spark expressions AND DuckDB oracles)
# ---------------------------------------------------------------------------

#: 60-bit hashes fit signed int64; 15 hex chars of md5
_HASH_HEX_CHARS = 15

#: Mersenne prime 2^31 - 1: (a*x + b) stays under 2^62, no overflow
MERSENNE_P = 2_147_483_647

MINHASH_K = 16
LSH_BANDS = 4
LSH_ROWS = 4  # MINHASH_K == LSH_BANDS * LSH_ROWS

_rng = random.Random(42)
#: k affine permutations h_i(x) = (a_i * x + b_i) mod P over the base hash
MINHASH_PERMS: tuple[tuple[int, int], ...] = tuple(
    (_rng.randrange(1, MERSENNE_P), _rng.randrange(0, MERSENNE_P))
    for _ in range(MINHASH_K)
)

SIMHASH_BITS = 32
SIMHASH_BAND_BITS = 8
SIMHASH_BANDS = SIMHASH_BITS // SIMHASH_BAND_BITS

#: random-hyperplane LSH for embeddings: +-1 planes, dim 64
EMBEDDING_DIM = 64
N_HYPERPLANES = 8
_rng2 = random.Random(7)
HYPERPLANES: tuple[tuple[int, ...], ...] = tuple(
    tuple(_rng2.choice((-1, 1)) for _ in range(EMBEDDING_DIM))
    for _ in range(N_HYPERPLANES)
)

#: Johnson-Lindenstrauss signed random projection (Achlioptas 2003
#: database-friendly +-1 entries): 64 -> 16 dims.  Seeded separately from
#: the LSH planes; the SAME Python-generated literals are embedded in the
#: Spark expressions and the DuckDB oracle, so both engines project with
#: the identical matrix.
RP_DIM = 16
_rng3 = random.Random(23)
RP_SIGNS: tuple[tuple[int, ...], ...] = tuple(
    tuple(_rng3.choice((-1, 1)) for _ in range(EMBEDDING_DIM))
    for _ in range(RP_DIM)
)


# ---------------------------------------------------------------------------
# hashing primitives
# ---------------------------------------------------------------------------


def hash60(c: Column) -> Column:
    """First 60 bits of md5 as a non-negative bigint — reproducible in any
    engine with md5 + hex parse (DuckDB: ('0x' || substr(md5(s),1,15))::BIGINT).
    """
    return F.conv(
        F.substring(F.md5(c.cast("binary")), 1, _HASH_HEX_CHARS), 16, 10
    ).cast("long")


#: one-evaluation binding for expensive subexpressions (see text.bind_once;
#: measured 10x+ on the MinHash pipeline)
_bind = bind_once


def _shingles_or_whole(text_col) -> Column:
    """3-word shingles; texts shorter than the shingle width fall back to
    one whole-text shingle (mirrors doc_fingerprint)."""
    sh = word_shingles(text_col)
    return F.when(F.size(sh) > 0, sh).otherwise(F.array(normalize_text(text_col)))


#: per-process memo of the BUILT Column expression trees for the two
#: signature builders, keyed by (builder, input-column repr).  The
#: builders are pure functions of module constants and the input column,
#: but constructing them costs hundreds of py4j round-trips — measured
#: 0.3-1.4s of pure driver time PER CALL (r11), paid by every LSH query.
#: A Column is an immutable unresolved expression tree resolved per
#: plan, so reuse across DataFrames AND across session restarts in one
#: process is sound (verified: same values after spark.stop() + new
#: session — the py4j gateway JVM owns the expression objects).
_COL_MEMO: dict[tuple[str, str], Column] = {}


def _memo_col(kind: str, text_col, build) -> Column:
    key = (kind, str(text_col))
    col = _COL_MEMO.get(key)
    if col is None:
        col = build()
        _COL_MEMO[key] = col
    return col


def minhash_signature(text_col) -> Column:
    """array<long> of MINHASH_K minimum permuted shingle hashes.

    Base hash per shingle is computed once; each permutation is a
    multiply-add mod P over the materialized base array.
    """
    return _memo_col("minhash_signature", text_col, lambda: _minhash_signature_build(text_col))


def _minhash_signature_build(text_col) -> Column:
    base = F.transform(_shingles_or_whole(text_col), lambda s: hash60(s) % MERSENNE_P)

    def perm(a: int, b: int):
        # closure factory, not default args: PySpark derives the lambda-var
        # count from the function's parameter count
        return lambda x: (F.lit(a) * x + F.lit(b)) % MERSENNE_P

    def all_perms(ba: Column) -> Column:
        return F.array(
            *[F.array_min(F.transform(ba, perm(a, b))) for a, b in MINHASH_PERMS]
        )

    # bind the hashed-shingle array once; the k permutations then read the
    # materialized value instead of re-hashing every shingle k times
    return _bind(base, all_perms)


def simhash32(text_col) -> Column:
    """32-bit SimHash over whitespace tokens (all occurrences, weight 1).

    bit j = 1 iff sum over tokens of (+1 if bit j of hash60(token) set
    else -1) is strictly positive.

    r10: computed in ONE aggregate pass with a 32-counter array
    accumulator (zip_with against the literal mask array) instead of 32
    independent ``aggregate`` passes over the token-hash array — the
    per-bit sums are the same exact integer additions, just accumulated
    per token instead of per bit, and the final fold ORs in the same
    power-of-two per strictly-positive counter (measured 2.4x, 0
    mismatches over every sf0.1 doc).
    """
    return _memo_col("simhash32", text_col, lambda: _simhash32_build(text_col))


def _simhash32_build(text_col) -> Column:
    hashes = F.transform(tokens(text_col), hash60)
    masks = F.array(*[F.lit(1 << j) for j in range(SIMHASH_BITS)])
    pows = F.array(*[F.lit(1 << j).cast("long") for j in range(SIMHASH_BITS)])

    def body(h: Column) -> Column:
        bits = F.aggregate(
            h,
            F.array(*[F.lit(0) for _ in range(SIMHASH_BITS)]),
            lambda acc, x: F.zip_with(
                acc,
                masks,
                lambda c, m: c
                + F.when(x.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)),
            ),
        )
        return F.aggregate(
            F.zip_with(
                bits, pows,
                lambda b, p: F.when(b > 0, p).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )

    # bind once: the folds read the materialized token-hash array
    return _bind(hashes, body)


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup pipeline
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, *, materialize: bool = False
) -> DataFrame:
    """(id, sig array<long>) — the per-doc signature relation.

    ``materialize=True`` persists the relation (MEMORY_AND_DISK): the LSH
    pipeline reads it from both sides of the band self-join plus the
    est-Jaccard joins, and without pinning, each consumer re-hashes every
    shingle.  At 100 TB the equivalent is writing signatures to a parquet
    stage table once and joining from there.

    r10: the scan is widened to the session parallelism first — the
    bench tables are one-row-group parquet files, so the whole
    shingle+hash projection otherwise runs in a single task (guide
    §2.2).
    """
    df = widen_for_compute(df)
    sigs = df.select(F.col(id_col), minhash_signature(F.col(text_col)).alias("sig"))
    # r10: eager localCheckpoint, not lazy persist — persist dedupes
    # execution but re-inlines the shingle+hash subtree at every
    # consumer reference (band self-join sides, est-Jaccard joins, shard
    # keys, ...), so multi-consumer queries carried 5-9 copies of the
    # signature pipeline in their analyzed plans.  The leaf is the local
    # analog of the parquet signature stage the docstring describes.
    return sigs.localCheckpoint(eager=True) if materialize else sigs


def write_signatures_table(
    df: DataFrame, path: str, *, text_col: str, id_col: str, mode: str = "overwrite"
) -> None:
    """One-pass signature stage table: ``(id, sig array<long>, sh long)``
    parquet at ``path`` (MinHash signature + 32-bit SimHash computed in a
    single scan of the corpus).

    This is the materialized form of ``minhash_signatures(materialize=
    True)``: at 100 TB the in-memory persist() becomes this parquet stage,
    paid once at ingest.  Signature rebuild dominates the LSH family's
    local cost (top-5 bench items in r03), and every re-run — banding
    join, threshold sweep, incremental dedup of a new batch against the
    corpus — reads ~200 bytes/doc of columnar signatures instead of
    re-shingling the raw text.  Pair generation from the stage is
    :func:`near_dup_pairs_from_signatures` /
    :func:`simhash_pairs_from_signatures`; pytest pins
    pairs-from-stage == pairs-from-raw.
    """
    widen_for_compute(df).select(
        F.col(id_col),
        minhash_signature(F.col(text_col)).alias("sig"),
        simhash32(F.col(text_col)).alias("sh"),
    ).write.mode(mode).parquet(path)


def read_signatures_table(spark, path: str) -> DataFrame:
    """Read a :func:`write_signatures_table` stage back as a DataFrame.

    The stage schema comes from the per-process schema memo (metadata
    only, keyed on file identity): every staged probe query re-reads
    this table, and bare-path schema inference costs a ~0.1s Spark job
    per read (r11)."""
    from ..sources.catalog import cached_parquet_schema

    return spark.read.schema(cached_parquet_schema(spark, path)).parquet(path)


def _band_key(sig: Column, band: int) -> Column:
    parts = [
        F.element_at(sig, band * LSH_ROWS + i + 1).cast("string")
        for i in range(LSH_ROWS)
    ]
    return F.concat_ws(",", *parts)


def lsh_candidate_pairs(sigs: DataFrame, id_col: str) -> DataFrame:
    """Distinct candidate (id_a, id_b) pairs sharing at least one LSH band.

    Plan: explode docs x bands -> equi-join on (band_id, band_key) ->
    distinct.  Shuffles are keyed on band buckets; no cross join anywhere.
    """
    bands = sigs.select(
        F.col(id_col),
        F.posexplode(
            # bind: project-collapse would otherwise inline the signature
            # expression into each of the LSH_BANDS x LSH_ROWS element_at's
            _bind(
                F.col("sig"),
                lambda s: F.array(*[_band_key(s, b) for b in range(LSH_BANDS)]),
            )
        ).alias("band_id", "band_key"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, ["band_id", "band_key"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def near_dup_pairs(
    df: DataFrame, text_col: str, id_col: str, threshold: float = 0.5
) -> DataFrame:
    """(id_a, id_b, est_jaccard) for LSH candidates whose signature-estimated
    Jaccard (fraction of equal MinHash components) >= threshold."""
    sigs = minhash_signatures(df, text_col, id_col, materialize=True)
    return near_dup_pairs_from_signatures(sigs, id_col, threshold)


def near_dup_pairs_from_signatures(
    sigs: DataFrame, id_col: str, threshold: float = 0.5
) -> DataFrame:
    """:func:`near_dup_pairs` starting from an existing ``(id, sig)``
    relation — the 100 TB entry point.  ``sigs`` is typically
    :func:`read_signatures_table` over a parquet stage written once by
    :func:`write_signatures_table`; every downstream consumer (banding
    join, est-Jaccard joins, re-runs with a different threshold) then
    reads columnar signatures instead of re-hashing every shingle of the
    raw corpus."""
    pairs = lsh_candidate_pairs(sigs, id_col)
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    est = (
        F.aggregate(
            F.zip_with(
                F.col("sig_a"),
                F.col("sig_b"),
                lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        ).cast("double")
        / F.lit(float(MINHASH_K))
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
    )


def near_dup_clusters(
    df: DataFrame, text_col: str, id_col: str, threshold: float = 0.5
) -> DataFrame:
    """(id, keep_id): one-step min-id propagation over the near-dup pair
    graph — every doc maps to the smallest id among itself and its
    above-threshold neighbors.  (Full connected components would iterate
    this join to a fixpoint; one step is the deterministic, bounded-cost
    keep rule used by large-scale dedup pipelines.)
    """
    sigs = minhash_signatures(df, text_col, id_col, materialize=True)
    return near_dup_clusters_from_signatures(sigs, id_col, threshold)


def near_dup_clusters_from_signatures(
    sigs: DataFrame, id_col: str, threshold: float = 0.5
) -> DataFrame:
    """:func:`near_dup_clusters` starting from an existing ``(id, sig)``
    relation (signature stage table / shared multi-leg scan, r11).
    ``sigs`` has one row per document, so it also supplies the node set
    for the keep rule — identical output to the raw-text form."""
    pairs = near_dup_pairs_from_signatures(sigs, id_col, threshold)
    neighbor_min = (
        pairs.select(F.col("id_a").alias(id_col), F.col("id_b").alias("n"))
        .union(pairs.select(F.col("id_b").alias(id_col), F.col("id_a").alias("n")))
        .groupBy(id_col)
        .agg(F.min("n").alias("min_neighbor"))
    )
    return (
        sigs.select(id_col)
        .join(neighbor_min, id_col, "left")
        .select(
            id_col,
            F.least(F.col(id_col), F.coalesce("min_neighbor", F.col(id_col))).alias(
                "keep_id"
            ),
        )
    )


def near_dup_components(
    df: DataFrame, text_col: str, id_col: str, threshold: float = 0.5,
    max_iters: int = 20,
) -> DataFrame:
    """(id, component) — FULL connected components over the near-dup pair
    graph via iterative min-label propagation (each node repeatedly takes
    the min label in its closed neighborhood; converges in graph-diameter
    rounds, and near-dup components are shallow).

    This is the exact-clustering upgrade of :func:`near_dup_clusters`'s
    one-step keep rule.  Each round is one join + one aggregate — the
    standard scalable CC loop (GraphFrames does the same dance); the loop
    runs on the driver but every data operation is distributed, and
    intermediate labels are persisted so re-EXECUTION stays flat.  The
    LOGICAL plan, though, still grows per round (persist dedupes
    execution, not the analyzed tree — §9.1), so every 5 rounds the
    label relation is ``localCheckpoint``-ed, which truncates lineage to
    the materialized blocks; at deeper graph diameters the analyzer cost
    stays O(5 rounds), not O(total rounds).
    """
    pairs = near_dup_pairs(df, text_col, id_col, threshold).select("id_a", "id_b")
    nodes = df.select(F.col(id_col).alias("id"))
    return components_from_pairs(nodes, pairs, max_iters).select(
        F.col("id").alias(id_col), "component"
    )


def components_from_pairs(
    nodes: DataFrame, pairs: DataFrame, max_iters: int = 20,
    compress: bool = False,
) -> DataFrame:
    """(id, component) — connected components over an arbitrary
    (id_a, id_b) pair relation via the min-label-propagation loop
    described in :func:`near_dup_components` (which delegates here);
    ``nodes`` must expose an ``id`` column covering every vertex.

    ``compress=True`` adds a pointer-doubling step per round
    (label <- label[label], one extra equi-join): plain neighbor-min
    needs DIAMETER rounds, fine for the shallow near-dup cliques this
    loop was built for, but a SPATIAL eps-graph forms long chains whose
    diameter exceeds any fixed round budget — path compression makes
    convergence O(log diameter), caught when spatial_dbscan at sf0.1
    disagreed with the recursive-CTE oracle after 20 plain rounds.

    Fault tolerance: the per-round ``localCheckpoint`` leaves trade
    executor-loss recovery for speed (SURVEY §11.1) — the cluster
    variant is a reliable checkpoint or a per-round label stage table,
    the standard distributed-CC pattern."""
    # localCheckpoint (not just persist): every iteration references the
    # edge relation twice, and persist dedupes EXECUTION but still inlines
    # the whole candidate-generation logical subtree (~6 shuffles) at each
    # reference — the analyzed plan grew ~60 shuffle nodes per round.
    # Checkpointing collapses edges to a LogicalRDD leaf, so each round
    # adds only its own join+aggregate to the plan.  (r10 note: a
    # repartition-by-join-key + persist layered on the checkpoint was
    # tried and REVERTED — pinning the partition count defeats AQE's
    # small-partition coalescing and turned every 1-task round stage
    # into a 32-task one, a measured 2-4x regression at bench scale.)
    edges = (
        pairs.union(pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # EVERY round's labels are eager-checkpointed (r10; compress mode
    # always did this — see the pointer-doubling note below).  The old
    # non-compress protocol (lazy persist + periodic checkpoint every 5
    # rounds) let the analyzed tree double per round — each round
    # references labels TWICE (neighbor_min + the join back), so a graph
    # converging at round 4 analyzed 2^4 tree copies in every round's
    # convergence count AND handed consumers a 16-copy plan (measured:
    # 3,195-line / 387-Exchange BCubed plan, 16s build on
    # embedding_near_dup_components).  The checkpoint executes exactly
    # the same per-round join+aggregate the convergence count used to
    # trigger through the persist, so compute volume is unchanged; the
    # count now joins two in-memory leaves.  A leaf is also what every
    # multi-reference consumer (BCubed cells, golden-record rollups,
    # soft-dedup weights) needs returned.
    labels = nodes.select("id", F.col("id").alias("label")).localCheckpoint(
        eager=True
    )
    # Per-round action fusion (r11): the convergence count used to JOIN
    # the new and old label leaves per round — a whole extra shuffle
    # join + count job on top of the checkpoint job.  The join-back
    # already sees both the old and the new label side by side, so the
    # change flag is carried as a COLUMN (chg := nmin < label, i.e. the
    # only way least() lowers the label), and the convergence count is
    # one cheap aggregate over the just-materialized leaf — per round:
    # one checkpoint job + one leaf scan instead of checkpoint + shuffle
    # join + count.  Label values are untouched.
    #
    # AQE is switched OFF for the loop body (saved/restored around it,
    # the streaming drain's conf pattern): with AQE on, every eager
    # checkpoint materializes each of the round's 2-4 exchanges as its
    # own job — spatial_dbscan measured 107 jobs for one query.  The
    # loop relations are leaves whose sizes AQE already fixed when the
    # edge/label leaves materialized, so per-round re-optimization buys
    # nothing; without it the round's lazy checkpoints chain and the
    # convergence count executes the WHOLE round as ONE job.  The loop's
    # static shuffle-partition count is derived from the materialized
    # edge leaf's own partitioning (itself AQE-coalesced from bytes) —
    # scale-adaptive, not a constant: a 100 TB edge relation keeps its
    # thousands of partitions, the bench-scale graph gets 1.
    spark = edges.sparkSession
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    loop_parts = max(
        edges.rdd.getNumPartitions(), labels.rdd.getNumPartitions()
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        labels = _components_loop(edges, labels, max_iters, compress)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    # edges is a localCheckpoint: its blocks are released by the
    # ContextCleaner once the returned plan (whose LogicalRDD leaf pins
    # them) is garbage-collected — no unpersist handle to manage
    return labels.select("id", F.col("label").alias("component"))


def _components_loop(
    edges: DataFrame, labels: DataFrame, max_iters: int, compress: bool
) -> DataFrame:
    """The min-label-propagation rounds of :func:`components_from_pairs`
    (split out so the caller can scope the loop's session-conf window).
    Runs with AQE off and a data-derived static shuffle-partition count;
    each round is ONE job: the lazy localCheckpoints materialize inside
    the convergence count's action."""
    for it in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.id_b == labels.id)
            .groupBy("id_a")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.id_a, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias(
                    "label"
                ),
                (F.coalesce("nmin", F.col("label")) < F.col("label")).alias(
                    "chg"
                ),
            )
        )
        if compress:
            # pointer doubling: every label IS a node id, so the lookup
            # join is total; label[label] <= label by induction.  The
            # self-join references the round's labels TWICE, so the
            # intermediate is checkpointed before the lookup join.  The
            # doubling step lowers a label iff llabel < label, which
            # ORs into the round's change flag (final != old  <=>
            # min-step changed OR doubling lowered the min-step result).
            base = new_labels.localCheckpoint(eager=False)
            lab2 = base.select(
                F.col("id").alias("lid"), F.col("label").alias("llabel")
            )
            new_labels = base.join(lab2, base.label == lab2.lid).select(
                "id",
                F.least("label", "llabel").alias("label"),
                (F.col("chg") | (F.col("llabel") < F.col("label"))).alias("chg"),
            )
        new_labels = new_labels.localCheckpoint(eager=False)
        changed = new_labels.where(F.col("chg")).count()
        labels = new_labels
        if changed == 0:
            break
    return labels


def components_reach_cte(threshold: float = 0.5) -> str:
    """The shared ``pairs``/``edges``/``reach`` CTE block of the
    connected-components oracle, parameterized by the MinHash-estimate
    threshold.  Callers must open ``WITH RECURSIVE`` and include
    :func:`_sig_cte` + :func:`_bands_cte` upstream; downstream CTEs read
    ``reach(id, root)`` where ``min(root) GROUP BY id`` is the component
    label.  Single definition so every oracle that depends on the
    component semantics (components itself, BCubed eval, golden records,
    …) stays in lockstep if the threshold convention or edge definition
    changes (ADVICE r9 item 4)."""
    return f"""pairs AS (
  SELECT cand.id_a, cand.id_b
  FROM cand
  JOIN sig sa ON sa.id = cand.id_a
  JOIN sig sb ON sb.id = cand.id_b
  WHERE list_sum(list_transform(generate_series(1, {MINHASH_K}),
        i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))::DOUBLE
        / {MINHASH_K}.0 >= {threshold}
),
edges AS (
  SELECT id_a, id_b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(id, root) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.id_b, r.root FROM reach r JOIN edges e ON e.id_a = r.id
)"""


def near_dup_components_oracle_sql(threshold: float = 0.5) -> str:
    """Recursive-CTE connected components: with symmetric edges, the min
    id reachable from a node IS its component min."""
    return f"""
WITH RECURSIVE {_sig_cte()}, {_bands_cte()},
{components_reach_cte(threshold)}
SELECT id AS doc_id, min(root) AS component FROM reach GROUP BY id
"""


def kcore_trajectory(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    k: int = 2,
    rounds: int = 6,
) -> DataFrame:
    """(round, n_nodes, n_edges) trajectory of iterative k-core peeling
    over the near-dup candidate graph: each round drops every vertex
    whose current degree is < ``k`` (and the edges touching it), a FIXED
    ``rounds`` times — the graph-structural dedup lens that separates
    dense duplicate cliques (which survive peeling: template families,
    mirror farms) from tree-like incidental overlap (which dissolves in
    a round or two).  Round 0 is the raw candidate graph; the last row
    approaches the k-core (the fixpoint of the peel, Seidman 1983 /
    Batagelj-Zaversnik 2003).

    The iteration count is pinned (not run-to-convergence) so the Spark
    loop and the oracle's unrolled CTE chain compute the identical
    relation.  Scale shape: each round is one degree aggregate + two
    semi-joins on the EDGE relation (already candidate-pruned by LSH,
    never all-pairs); every round's edges are ``localCheckpoint``-ed so
    the logical plan stays O(1) per round instead of nesting the whole
    prior chain (the §9.1 iterative-plan lesson), and the per-round
    1-row summaries read those materialized blocks."""
    pairs = near_dup_pairs(df, text_col, id_col, threshold).select(
        "id_a", "id_b"
    )
    edges = (
        pairs.union(
            pairs.select(
                F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    summaries = []
    for r in range(rounds + 1):
        summaries.append(
            edges.agg(
                F.lit(r).cast("long").alias("round"),
                F.countDistinct("id_a").cast("long").alias("n_nodes"),
                F.floor(F.count(F.lit(1)) / 2).cast("long").alias("n_edges"),
            )
        )
        if r == rounds:
            break
        keep = (
            edges.groupBy("id_a")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= k)
            .select(F.col("id_a").alias("v"))
        )
        edges = (
            edges.join(keep, edges.id_a == keep.v, "left_semi")
            .join(
                keep.select(F.col("v").alias("w")),
                F.col("id_b") == F.col("w"),
                "left_semi",
            )
            .localCheckpoint(eager=True)
        )
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionAll(s)
    return out


def kcore_trajectory_oracle_sql(
    threshold: float = 0.5, k: int = 2, rounds: int = 6
) -> str:
    """Unrolled CTE chain mirror of :func:`kcore_trajectory`: e0 is the
    symmetric candidate graph, e{r+1} keeps the edges whose BOTH
    endpoints have degree >= k in e{r}; the summary union reads every
    stage.  Unrolling (not a recursive CTE) keeps the per-round relation
    named so the trajectory — not just the fixpoint — is certified."""
    parts = [
        f"""e0 AS MATERIALIZED (
  SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs
)"""
    ]
    for r in range(rounds):
        parts.append(
            f"""k{r} AS (
  SELECT id_a AS v FROM e{r} GROUP BY 1 HAVING count(*) >= {k}
),
e{r + 1} AS MATERIALIZED (
  SELECT e.id_a, e.id_b FROM e{r} e
  JOIN k{r} ka ON ka.v = e.id_a
  JOIN k{r} kb ON kb.v = e.id_b
)"""
        )
    summary = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, count(DISTINCT id_a) AS n_nodes,"
        f" count(*) // 2 AS n_edges FROM e{r}"
        for r in range(rounds + 1)
    )
    return f"""
WITH {_sig_cte()}, {_bands_cte()},
pairs AS (
  SELECT cand.id_a, cand.id_b
  FROM cand
  JOIN sig sa ON sa.id = cand.id_a
  JOIN sig sb ON sb.id = cand.id_b
  WHERE list_sum(list_transform(generate_series(1, {MINHASH_K}),
        i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))::DOUBLE
        / {MINHASH_K}.0 >= {threshold}
),
{",".join(parts)}
{summary}
"""


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, threshold: float = 0.3
) -> DataFrame:
    """Exact distinct-shingle-set Jaccard, evaluated on LSH candidates only
    (the re-rank step after MinHash recall)."""
    sh = df.select(
        F.col(id_col),
        F.array_distinct(_shingles_or_whole(F.col(text_col))).alias("sh"),
    ).persist()
    sigs = minhash_signatures(df, text_col, id_col, materialize=True)
    pairs = lsh_candidate_pairs(sigs, id_col)
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", r6n(F.col("jaccard")).alias("jaccard"))
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    probe_k: int = 8,
    max_df: int = 64,
) -> DataFrame:
    """Asymmetric near-dup detection: containment ``|A ∩ B| / min(|A|, |B|)``
    — the signal Jaccard misses when one document is a chunk of another
    (quote pages, concatenated dumps: a 100-shingle doc inside a
    10k-shingle doc has Jaccard ≈ 0.01 but containment 1.0).

    MinHash-LSH candidates CANNOT recall these pairs (band collision
    probability is Jaccard-driven), so candidate generation here is a
    shingle inverted index probed with each doc's ``probe_k`` smallest
    shingle hashes: if A ⊆ B, every probe of A hits B by construction —
    cost k rows per doc against a linear-size index, all equi-joins.
    Shingles occurring in more than ``max_df`` docs are dropped from the
    index (stop-shingle filter — boilerplate would otherwise create
    quadratic hot-key candidates; the repetition/boilerplate ops own
    that signal).  Recall for true containment is therefore 1.0 *given
    that at least one of the contained doc's k probe shingles survives
    the df cap*: a doc whose ``probe_k`` smallest hashes are ALL
    boilerplate (df > max_df) loses every probe and its pairs are
    missed — the deliberate trade for killing the hot keys; raise
    ``probe_k``/``max_df`` to push the miss probability down.  Exact
    containment is then verified on the candidate pairs only.  Count
    ratio → boundary-nudged rounding.
    """
    sh = df.select(
        F.col(id_col),
        F.array_distinct(
            F.transform(_shingles_or_whole(F.col(text_col)), hash60)
        ).alias("hs"),
    ).persist()
    index = sh.select(F.col(id_col).alias("ix_id"), F.explode("hs").alias("h"))
    rare = index.groupBy("h").agg(F.count(F.lit(1)).alias("df_h")).where(
        F.col("df_h") <= max_df
    )
    index = index.join(rare.select("h"), "h")
    probes = sh.select(
        F.col(id_col).alias("pr_id"),
        F.explode(F.slice(F.array_sort("hs"), 1, probe_k)).alias("h"),
    ).join(rare.select("h"), "h")
    cand = (
        probes.join(index, "h")
        .where(F.col("pr_id") != F.col("ix_id"))
        .select(
            F.least("pr_id", "ix_id").alias("id_a"),
            F.greatest("pr_id", "ix_id").alias("id_b"),
        )
        .distinct()
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("hs").alias("hs_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b")).cast("double")
    containment = inter / F.least(F.size("hs_a"), F.size("hs_b")).cast("double")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("containment", containment)
        .where(F.col("containment") >= F.lit(threshold))
        .select(
            "id_a",
            "id_b",
            F.size("hs_a").cast("long").alias("n_grams_a"),
            F.size("hs_b").cast("long").alias("n_grams_b"),
            r6n(F.col("containment")).alias("containment"),
        )
    )


def edit_distance_verified_pairs(
    df: DataFrame, text_col: str, id_col: str, min_similarity: float = 0.8
) -> DataFrame:
    """LSH candidate pairs verified by exact Levenshtein distance — the
    "expensive verify on cheap candidates" stage of a production dedup
    pipeline.  Returns (id_a, id_b, edit_dist, edit_sim) where
    ``edit_sim = 1 - dist / max(len_a, len_b)`` and only pairs with
    ``edit_sim >= min_similarity`` survive.

    The quadratic-cost edit distance runs only on the LSH candidate set
    (output of the banded MinHash join), never all pairs — at 100 TB the
    candidate set is ~linear in the duplicate count, so the verify stage
    stays proportional to actual near-dups.
    """
    sigs = minhash_signatures(df, text_col, id_col, materialize=True)
    pairs = lsh_candidate_pairs(sigs, id_col)
    txt = df.select(F.col(id_col), F.col(text_col).alias("__t"))
    a = txt.select(F.col(id_col).alias("id_a"), F.col("__t").alias("t_a"))
    b = txt.select(F.col(id_col).alias("id_b"), F.col("__t").alias("t_b"))
    dist = F.levenshtein("t_a", "t_b")
    sim = F.lit(1.0) - dist.cast("double") / F.greatest(
        F.length("t_a"), F.length("t_b")
    ).cast("double")
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("edit_dist", dist.cast("long"))
        .withColumn("edit_sim", sim)
        .where(F.col("edit_sim") >= F.lit(min_similarity))
        .select(
            "id_a", "id_b", "edit_dist", r6n(F.col("edit_sim")).alias("edit_sim")
        )
    )


def simhash_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """(id_a, id_b, hamming) pairs whose 32-bit SimHashes differ in at most
    ``max_hamming`` bits, blocked on 8-bit bands (a pair within Hamming
    distance <= 3 shares at least one of the 4 bands, so banding loses no
    qualifying pair).

    r10: the signature relation is persisted — the banded self-join reads
    it from both sides, and without pinning each side re-evaluated the
    simhash projection over the raw text (the before-plan scanned the
    parquet and ran the HOF twice)."""
    sh = (
        widen_for_compute(df)
        .select(F.col(id_col), simhash32(F.col(text_col)).alias("sh"))
        .persist()
    )
    return simhash_pairs_from_signatures(sh, id_col, max_hamming)


def simhash_pairs_from_signatures(
    sh: DataFrame, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """:func:`simhash_pairs` starting from an existing ``(id, sh)``
    relation (e.g. the ``simhash`` column of a
    :func:`write_signatures_table` stage)."""
    sh = sh.select(F.col(id_col), F.col("sh"))

    def band_array(h: Column) -> Column:
        return F.array(
            *[
                F.shiftrightunsigned(h, b * SIMHASH_BAND_BITS)
                .bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1))
                .cast("long")
                for b in range(SIMHASH_BANDS)
            ]
        )

    bands = sh.select(
        F.col(id_col),
        F.col("sh"),
        F.posexplode(_bind(F.col("sh"), band_array)).alias("band_id", "band_key"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, ["band_id", "band_key"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= F.lit(max_hamming))
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding cosine similarity — exact top-k and hyperplane-LSH ANN
# ---------------------------------------------------------------------------


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns, computed in double.

    Both input arrays are bound once (see ``_bind``) so the dot product and
    the two norms share one cast/materialization per side.
    """
    return _bind(
        _as_double(a),
        lambda ad: _bind(
            _as_double(b), lambda bd: _dot(ad, bd) / (_norm(ad) * _norm(bd))
        ),
    )


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: (q_id, neighbor_id, cos, rank).

    The query side is a literal-ID filter broadcast against the corpus —
    at 100 TB the corpus side streams through one pass, no shuffle of the
    corpus itself; ranking shuffles only (q x corpus-partition) top rows.
    Ranking uses the 6-dp-rounded cosine (then neighbor id) so order is
    reproducible across engines and partitionings.
    """
    from pyspark.sql import Window

    q = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("q_id") != F.col("neighbor_id"))
        .select(
            "q_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


def hard_negative_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining: for each query vector, the top-k most
    cosine-similar vectors with a DIFFERENT label — the contrastive-
    training pairs that are hard precisely because the embedding thinks
    they match.  (q_id, neighbor_id, neighbor_label, cos, rank).

    Same plan skeleton as :func:`cosine_topk` (broadcast query side, one
    corpus pass, per-query top-k via rank window on the rounded cosine),
    plus the label-inequality predicate evaluated inside the same join —
    no second pass, no extra shuffle.  At 100 TB the label filter
    typically removes ~1/n_classes of candidates for free during the
    scan.
    """
    from pyspark.sql import Window

    q = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(label_col).alias("q_label"),
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(label_col).alias("neighbor_label"),
    )
    scored = (
        F.broadcast(q)
        .join(
            c,
            (F.col("q_id") != F.col("neighbor_id"))
            & (F.col("q_label") != F.col("neighbor_label")),
        )
        .select(
            "q_id",
            "neighbor_id",
            "neighbor_label",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "q_id",
            "neighbor_id",
            "neighbor_label",
            "cos",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def hard_negative_topk_oracle_sql(query_ids: list[int], k: int = 3) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    cos = _cos_sql("q.q_vec", "e.embedding")
    return f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label
           FROM embeddings WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.q_id, e.vec_id AS neighbor_id, e.label AS neighbor_label,
         round({cos}, 6) AS cos
  FROM q JOIN embeddings e
    ON e.vec_id <> q.q_id AND e.label <> q.q_label
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT q_id, neighbor_id, neighbor_label, cos, rank::INT AS rank
FROM r WHERE rank <= {k}
"""


#: matryoshka prefix width — the truncated-embedding cheap-search dims
MATRYOSHKA_DIMS = 16


def matryoshka_topk(
    emb: DataFrame,
    query_ids: list[int],
    dims: int = MATRYOSHKA_DIMS,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine top-k over the first ``dims`` components of each embedding —
    matryoshka-style truncated retrieval (the coarse pass of a
    funnel: score 4x cheaper on the prefix, re-rank survivors at full
    width).  Cosine is scale-invariant, so no renormalization is needed;
    the plan is identical to :func:`cosine_topk` with a 4x narrower
    scoring expression and the same broadcast-query / stream-corpus
    shape.
    """
    sliced = emb.select(
        F.col(id_col), F.slice(F.col(vec_col), 1, dims).alias(vec_col)
    )
    return cosine_topk(sliced, query_ids, k=k, id_col=id_col, vec_col=vec_col)


def matryoshka_topk_oracle_sql(
    query_ids: list[int], dims: int = MATRYOSHKA_DIMS, k: int = 5
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
           WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.q_id, e.vec_id AS neighbor_id,
         round({_cos_sql('q.q_vec', 'e.embedding', dims)}, 6) AS cos
  FROM q JOIN embeddings e ON e.vec_id <> q.q_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT q_id, neighbor_id, cos, rank::INT AS rank FROM r WHERE rank <= {k}
"""


def hyperplane_bucket(vec: Column) -> Column:
    """Random-hyperplane LSH bucket id in [0, 2^N_HYPERPLANES): bit p is set
    iff dot(vec, plane_p) > 0.  Planes are the module's fixed +-1 matrix."""
    def body(v: Column) -> Column:
        out = F.lit(0).cast("long")
        for p, plane in enumerate(HYPERPLANES):
            dot = F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(h)) for h in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, val: acc + val,
            )
            out = out + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
        return out

    return _bind(_as_double(vec), body)


#: coarse-quantizer "centroid" vector ids for the IVF path — fixed corpus
#: rows standing in for k-means centroids (training-free, deterministic;
#: a production IVF would Lloyd-iterate these)
IVF_CENTROID_IDS: tuple[int, ...] = tuple(range(100, 116))


def ivf_assign(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_ids: tuple[int, ...] = IVF_CENTROID_IDS,
) -> DataFrame:
    """(id, vec, cell): nearest-centroid assignment — the IVF coarse
    quantizer.  One broadcast join of the corpus against |centroids| rows,
    argmax by (rounded cosine, min centroid id) for cross-engine
    determinism; cost O(corpus x centroids), a single pass.
    """
    cent = F.broadcast(
        emb.where(F.col(id_col).isin(list(centroid_ids))).select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec")
        )
    )
    scored = emb.select(F.col(id_col), F.col(vec_col)).join(cent).select(
        id_col,
        vec_col,
        "cent_id",
        F.round(cosine(F.col(vec_col), F.col("cent_vec")), 6).alias("c"),
    )
    return scored.groupBy(id_col).agg(
        F.first(vec_col).alias(vec_col),
        F.max_by(
            "cent_id", F.struct(F.col("c").alias("c"), (-F.col("cent_id")).alias("t"))
        ).alias("cell"),
    )


def ivf_cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_ids: tuple[int, ...] = IVF_CENTROID_IDS,
) -> DataFrame:
    """IVF(nprobe=1) ANN top-k: candidates limited to the query's own
    centroid cell; the cell join is an equi-join keyed on the cell id.
    Same output shape as the exact/LSH paths (q_id, neighbor_id, cos, rank).
    """
    from pyspark.sql import Window

    assigned = ivf_assign(emb, id_col, vec_col, centroid_ids)
    q = assigned.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), "cell"
    )
    c = assigned.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), "cell"
    )
    scored = (
        F.broadcast(q)
        .join(c, "cell")
        .where(F.col("q_id") != F.col("neighbor_id"))
        .select(
            "q_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cos) embedding near-duplicates: bucket by random
    hyperplane, self-join within buckets, keep pairs at cosine >= threshold.

    The self-join is an equi-join on the bucket id — candidate volume is
    sum over buckets of n_b^2, never corpus^2; tighter thresholds want more
    hyperplanes (narrower buckets).  Recall loss vs all-pairs is the LSH
    trade, same as the MinHash text path.
    """
    bucketed = emb.select(
        F.col(id_col), F.col(vec_col), hyperplane_bucket(F.col(vec_col)).alias("bucket")
    )
    a = bucketed.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), "bucket"
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("v_a"), F.col("v_b")), 6))
        .where(F.col("cos") >= F.lit(threshold))
        .select("id_a", "id_b", "cos")
    )


def embedding_near_dup_pairs_oracle_sql(threshold: float = 0.9) -> str:
    return f"""
WITH b AS (SELECT vec_id, embedding, {{bucket}} AS bucket FROM embeddings)
SELECT a.vec_id AS id_a, c.vec_id AS id_b,
       round({{cos}}, 6) AS cos
FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
WHERE round({{cos}}, 6) >= {threshold}
""".format(
        bucket=_bucket_sql("embedding"),
        cos=_cos_sql("a.embedding", "c.embedding"),
    )


def quantize_int8(vec: Column) -> Column:
    """Symmetric int8 scalar quantization of an embedding vector:
    ``struct(scale, q)`` with ``scale = max(|x|)/127`` and
    ``q_i = round(x_i / scale)`` (all-zero vectors quantize to zeros).

    4x storage/shuffle shrink for ANN at 100 TB; pure JVM higher-order
    functions, and round() on IEEE doubles agrees bit-exact across
    engines (verified vs DuckDB).  The vector and the scale are bound as
    lambda values (nested ``bind_once``) so neither is re-evaluated per
    element — an inline ``array_max`` would otherwise be O(dim^2)/row."""
    return _bind(
        _as_double(vec),
        lambda v: _bind(
            F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0),
            lambda s: F.struct(
                s.alias("scale"),
                F.when(
                    s > 0, F.transform(v, lambda x: F.round(x / s).cast("int"))
                )
                .otherwise(F.transform(v, lambda x: F.lit(0)))
                .alias("q"),
            ),
        ),
    )


def ann_cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates restricted to the query's hyperplane bucket.

    Plan: project bucket per row (one corpus pass), equi-join query
    buckets to corpus buckets — shuffle keyed on the bucket id, never a
    cross join.  Recall < 1 by construction; the exact path is the oracle
    for quality measurement.
    """
    from pyspark.sql import Window

    bucketed = emb.select(
        F.col(id_col), F.col(vec_col), hyperplane_bucket(F.col(vec_col)).alias("bucket")
    )
    q = bucketed.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("bucket"),
    )
    c = bucketed.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .where(F.col("q_id") != F.col("neighbor_id"))
        .select(
            "q_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL generators — same constants, same pipeline
# ---------------------------------------------------------------------------

_NORM_SQL = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
_TOKS_SQL = f"str_split({_NORM_SQL}, ' ')"


def _hash60_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, {_HASH_HEX_CHARS}))::BIGINT"


def _sig_cte(table: str = "documents", id_col: str = "doc_id") -> str:
    """CTEs producing sig(id, sig LIST(BIGINT)) with MINHASH_K entries."""
    perm_exprs = ", ".join(
        f"list_min(list_transform(base, x -> ({a} * x + {b}) % {MERSENNE_P}))"
        for a, b in MINHASH_PERMS
    )
    return f"""
t AS (SELECT {id_col} AS id, {_NORM_SQL} AS norm, {_TOKS_SQL} AS toks FROM {table}),
sh AS (
  SELECT id,
         CASE WHEN len(toks) >= 3
              THEN list_transform(generate_series(1, len(toks) - 2),
                                  i -> array_to_string(toks[i:i+2], ' '))
              ELSE [norm] END AS shingles
  FROM t
),
based AS (
  SELECT id,
         list_transform(shingles, s -> {_hash60_sql('s')} % {MERSENNE_P}) AS base
  FROM sh
),
sig AS (SELECT id, [{perm_exprs}] AS sig FROM based)
"""


def _bands_cte() -> str:
    band_selects = " UNION ALL ".join(
        f"SELECT id, {b} AS band_id, "
        f"array_to_string(sig[{b * LSH_ROWS + 1}:{(b + 1) * LSH_ROWS}], ',') AS band_key, sig "
        f"FROM sig"
        for b in range(LSH_BANDS)
    )
    return f"""
bands AS ({band_selects}),
cand AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
  WHERE a.id < b.id
  GROUP BY 1, 2
)
"""


def near_dup_pairs_oracle_sql(threshold: float = 0.5) -> str:
    eq_terms = f"""list_sum(list_transform(generate_series(1, {MINHASH_K}),
        i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))"""
    return f"""
WITH {_sig_cte()}, {_bands_cte()}
SELECT cand.id_a, cand.id_b,
       round({eq_terms}::DOUBLE / {MINHASH_K}.0, 6) AS est_jaccard
FROM cand
JOIN sig sa ON sa.id = cand.id_a
JOIN sig sb ON sb.id = cand.id_b
WHERE {eq_terms}::DOUBLE / {MINHASH_K}.0 >= {threshold}
"""


def edit_distance_verified_pairs_oracle_sql(min_similarity: float = 0.8) -> str:
    sim = (
        "(1.0 - levenshtein(ta.text, tb.text)::DOUBLE / "
        "greatest(length(ta.text), length(tb.text))::DOUBLE)"
    )
    return f"""
WITH {_sig_cte()}, {_bands_cte()}
SELECT cand.id_a, cand.id_b,
       levenshtein(ta.text, tb.text)::BIGINT AS edit_dist,
       {r6n_sql(sim)} AS edit_sim
FROM cand
JOIN documents ta ON ta.doc_id = cand.id_a
JOIN documents tb ON tb.doc_id = cand.id_b
WHERE {sim} >= {min_similarity}
"""


def near_dup_clusters_oracle_sql(threshold: float = 0.5) -> str:
    return f"""
WITH {_sig_cte()}, {_bands_cte()},
pairs AS (
  SELECT cand.id_a, cand.id_b
  FROM cand
  JOIN sig sa ON sa.id = cand.id_a
  JOIN sig sb ON sb.id = cand.id_b
  WHERE list_sum(list_transform(generate_series(1, {MINHASH_K}),
        i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))::DOUBLE
        / {MINHASH_K}.0 >= {threshold}
),
nmin AS (
  SELECT id, min(n) AS min_neighbor FROM (
    SELECT id_a AS id, id_b AS n FROM pairs
    UNION ALL
    SELECT id_b AS id, id_a AS n FROM pairs
  ) GROUP BY 1
)
SELECT d.doc_id, least(d.doc_id, coalesce(nmin.min_neighbor, d.doc_id)) AS keep_id
FROM documents d LEFT JOIN nmin ON nmin.id = d.doc_id
"""


def ngram_jaccard_pairs_oracle_sql(threshold: float = 0.3) -> str:
    jac = (
        "len(list_intersect(a.sh, b.sh))::DOUBLE"
        " / len(list_distinct(list_concat(a.sh, b.sh)))::DOUBLE"
    )
    return f"""
WITH {_sig_cte()}, {_bands_cte()},
dsh AS (
  SELECT id, list_distinct(shingles) AS sh FROM sh
)
SELECT cand.id_a, cand.id_b,
       {r6n_sql(jac)} AS jaccard
FROM cand
JOIN dsh a ON a.id = cand.id_a
JOIN dsh b ON b.id = cand.id_b
WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
      / len(list_distinct(list_concat(a.sh, b.sh)))::DOUBLE >= {threshold}
"""


def ngram_containment_pairs_oracle_sql(
    threshold: float = 0.8, probe_k: int = 8, max_df: int = 64
) -> str:
    h = _hash60_sql("s")
    cont = (
        "len(list_intersect(a.hs, b.hs))::DOUBLE"
        " / least(len(a.hs), len(b.hs))::DOUBLE"
    )
    return f"""
WITH t AS (SELECT doc_id AS id, {_NORM_SQL} AS norm, {_TOKS_SQL} AS toks
           FROM documents),
shg AS (
  SELECT id,
         CASE WHEN len(toks) >= 3
              THEN list_transform(generate_series(1, len(toks) - 2),
                                  i -> array_to_string(toks[i:i+2], ' '))
              ELSE [norm] END AS shingles
  FROM t
),
dh AS (SELECT id, list_distinct(list_transform(shingles, s -> {h})) AS hs
       FROM shg),
ix AS (SELECT id AS ix_id, unnest(hs) AS h FROM dh),
rare AS (SELECT h FROM ix GROUP BY h HAVING count(*) <= {max_df}),
ixr AS (SELECT ix.ix_id, ix.h FROM ix JOIN rare USING (h)),
pr AS (
  SELECT dh.id AS pr_id, unnest(list_sort(hs)[1:{probe_k}]) AS h FROM dh
),
prr AS (SELECT pr.pr_id, pr.h FROM pr JOIN rare USING (h)),
cand AS (
  SELECT DISTINCT least(pr_id, ix_id) AS id_a, greatest(pr_id, ix_id) AS id_b
  FROM prr JOIN ixr USING (h)
  WHERE pr_id <> ix_id
)
SELECT cand.id_a, cand.id_b,
       len(a.hs)::BIGINT AS n_grams_a,
       len(b.hs)::BIGINT AS n_grams_b,
       {r6n_sql(cont)} AS containment
FROM cand
JOIN dh a ON a.id = cand.id_a
JOIN dh b ON b.id = cand.id_b
WHERE {cont} >= {threshold}
"""


def simhash_oracle_sql() -> str:
    """Per-doc 32-bit SimHash (the fingerprint relation itself)."""
    bit_terms = " + ".join(
        f"""CASE WHEN list_sum(list_transform(hashes,
             x -> CASE WHEN (x >> {j}) & 1 = 1 THEN 1 ELSE -1 END)) > 0
           THEN {1 << j} ELSE 0 END"""
        for j in range(SIMHASH_BITS)
    )
    return f"""
WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
h AS (SELECT doc_id, list_transform(toks, s -> {_hash60_sql('s')}) AS hashes FROM t)
SELECT doc_id, ({bit_terms})::BIGINT AS simhash FROM h
"""


def simhash_pairs_oracle_sql(max_hamming: int = 3) -> str:
    """Banded-Hamming SimHash pairs, mirroring simhash_pairs."""
    bit_terms = " + ".join(
        f"""CASE WHEN list_sum(list_transform(hashes,
             x -> CASE WHEN (x >> {j}) & 1 = 1 THEN 1 ELSE -1 END)) > 0
           THEN {1 << j} ELSE 0 END"""
        for j in range(SIMHASH_BITS)
    )
    mask = (1 << SIMHASH_BAND_BITS) - 1
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, sh, {b} AS band_id, (sh >> {b * SIMHASH_BAND_BITS}) & {mask} AS band_key FROM s"
        for b in range(SIMHASH_BANDS)
    )
    return f"""
WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
h AS (SELECT doc_id, list_transform(toks, s -> {_hash60_sql('s')}) AS hashes FROM t),
s AS (SELECT doc_id, ({bit_terms})::BIGINT AS sh FROM h),
bands AS ({band_selects}),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         min(bit_count(xor(a.sh, b.sh))) AS hamming
  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, hamming::INT AS hamming FROM cand WHERE hamming <= {max_hamming}
"""


def _cos_sql(a: str, b: str, dim: int = EMBEDDING_DIM) -> str:
    dot = (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
    )
    na = (
        f"sqrt(list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE)))"
    )
    nb = (
        f"sqrt(list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> {b}[i]::DOUBLE * {b}[i]::DOUBLE)))"
    )
    return f"({dot}) / (({na}) * ({nb}))"


def cosine_topk_oracle_sql(query_ids: list[int], k: int = 5) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
           WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.q_id, e.vec_id AS neighbor_id,
         round({_cos_sql('q.q_vec', 'e.embedding')}, 6) AS cos
  FROM q JOIN embeddings e ON e.vec_id <> q.q_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT q_id, neighbor_id, cos, rank::INT AS rank FROM r WHERE rank <= {k}
"""


def mmr_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    pool: int = 16,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick ``k`` results per query from its
    relevance-top-``pool`` candidates, each round taking the candidate
    maximizing ``cos(q, c) - lam * max_{s in selected} cos(c, s)`` —
    the diversity-aware retrieval head every RAG/dedup-aware search
    stack wants on top of plain ANN (plain top-k returns the same
    near-duplicate cluster k times; MMR returns the cluster once).

    (q_id, pick_rank, neighbor_id, relevance, mmr) — pick_rank 1 is the
    pure-relevance argmax (mmr NULL), later rows carry the greedy score
    at pick time.  Determinism: both relevance and candidate-candidate
    sims use the house 6-dp-rounded cosine, greedy argmax tie-breaks by
    neighbor id, and each greedy round operates on the BOUNDED
    (queries x pool) relation — the corpus-sized work is exactly the
    one :func:`cosine_topk` pass that builds the pool."""
    from pyspark.sql import Window

    pool_df = cosine_topk(emb, query_ids, k=pool, id_col=id_col, vec_col=vec_col)
    vecs = emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("vec"))
    p = (
        pool_df.join(vecs, pool_df.neighbor_id == vecs.nid)
        .select("q_id", "neighbor_id", "cos", "rank", "vec")
        .localCheckpoint(eager=True)
    )
    a = p.select(
        "q_id", F.col("neighbor_id").alias("id_a"), F.col("vec").alias("va")
    )
    b = p.select(
        "q_id", F.col("neighbor_id").alias("id_b"), F.col("vec").alias("vb")
    )
    sims = (
        a.join(b, "q_id")
        .where(F.col("id_a") != F.col("id_b"))
        .select(
            "q_id",
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim"),
        )
        .localCheckpoint(eager=True)
    )
    sel = p.where(F.col("rank") == 1).select(
        "q_id",
        "neighbor_id",
        F.col("cos").alias("relevance"),
        F.lit(None).cast("double").alias("mmr"),
        F.lit(1).cast("int").alias("pick_rank"),
    )
    for r in range(2, k + 1):
        taken = sel.select("q_id", F.col("neighbor_id").alias("id_b"))
        msim = (
            sims.join(taken, ["q_id", "id_b"])
            .groupBy("q_id", "id_a")
            .agg(F.max("sim").alias("msim"))
        )
        scored = (
            msim.join(
                taken.select("q_id", F.col("id_b").alias("id_a")),
                ["q_id", "id_a"],
                "left_anti",
            )
            .join(
                p.select("q_id", F.col("neighbor_id").alias("id_a"), "cos"),
                ["q_id", "id_a"],
            )
            .withColumn(
                "mmr", F.round(F.col("cos") - F.lit(lam) * F.col("msim"), 6)
            )
        )
        w = Window.partitionBy("q_id").orderBy(
            F.col("mmr").desc(), F.col("id_a").asc()
        )
        pick = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(
                "q_id",
                F.col("id_a").alias("neighbor_id"),
                F.col("cos").alias("relevance"),
                "mmr",
                F.lit(r).cast("int").alias("pick_rank"),
            )
        )
        sel = sel.unionAll(pick).localCheckpoint(eager=True)
    return sel.select("q_id", "pick_rank", "neighbor_id", "relevance", "mmr")


def mmr_topk_oracle_sql(
    query_ids: list[int], k: int = 5, pool: int = 16, lam: float = 0.5
) -> str:
    """Unrolled greedy rounds mirroring :func:`mmr_topk` — identical
    6-dp cosine convention, identical (mmr DESC, id ASC) argmax."""
    ids = ", ".join(str(i) for i in query_ids)
    parts = [
        f"""sel1 AS (
  SELECT q_id, neighbor_id, cos AS relevance,
         CAST(NULL AS DOUBLE) AS mmr, 1 AS pick_rank
  FROM pool WHERE rank = 1
),
acc1 AS (SELECT q_id, neighbor_id FROM sel1)"""
    ]
    for r in range(2, k + 1):
        parts.append(
            f"""m{r} AS (
  SELECT s.q_id, s.id_a, max(s.sim) AS msim
  FROM sims s JOIN acc{r - 1} a ON a.q_id = s.q_id
                              AND a.neighbor_id = s.id_b
  WHERE NOT EXISTS (SELECT 1 FROM acc{r - 1} x
                    WHERE x.q_id = s.q_id AND x.neighbor_id = s.id_a)
  GROUP BY 1, 2
),
sel{r} AS (
  SELECT q_id, neighbor_id, relevance, mmr, {r} AS pick_rank FROM (
    SELECT m.q_id, m.id_a AS neighbor_id, p.cos AS relevance,
           round(p.cos - {lam} * m.msim, 6) AS mmr,
           row_number() OVER (
             PARTITION BY m.q_id
             ORDER BY round(p.cos - {lam} * m.msim, 6) DESC, m.id_a ASC
           ) AS rn
    FROM m{r} m JOIN pool p ON p.q_id = m.q_id AND p.neighbor_id = m.id_a
  ) WHERE rn = 1
),
acc{r} AS (SELECT q_id, neighbor_id FROM acc{r - 1}
           UNION ALL SELECT q_id, neighbor_id FROM sel{r})"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM sel{r}" for r in range(1, k + 1)
    )
    return f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
           WHERE vec_id IN ({ids})),
scored0 AS (
  SELECT q.q_id, e.vec_id AS neighbor_id, e.embedding AS vec,
         round({_cos_sql('q.q_vec', 'e.embedding')}, 6) AS cos
  FROM q JOIN embeddings e ON e.vec_id <> q.q_id
),
pool AS MATERIALIZED (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
                                 ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM scored0
  ) WHERE rank <= {pool}
),
sims AS MATERIALIZED (
  SELECT a.q_id, a.neighbor_id AS id_a, b.neighbor_id AS id_b,
         round({_cos_sql('a.vec', 'b.vec')}, 6) AS sim
  FROM pool a JOIN pool b ON b.q_id = a.q_id
                         AND b.neighbor_id <> a.neighbor_id
),
{",".join(parts)}
SELECT q_id, pick_rank::INT AS pick_rank, neighbor_id, relevance, mmr
FROM ({union})
"""


def _bucket_sql(vec: str) -> str:
    terms = []
    for p, plane in enumerate(HYPERPLANES):
        arr = "[" + ", ".join(f"{float(h)}" for h in plane) + "]"
        dot = (
            f"list_sum(list_transform(generate_series(1, {EMBEDDING_DIM}), "
            f"i -> {vec}[i]::DOUBLE * ({arr}::DOUBLE[])[i]))"
        )
        terms.append(f"CASE WHEN ({dot}) > 0 THEN {1 << p} ELSE 0 END")
    return "(" + " + ".join(terms) + ")::BIGINT"


def ivf_cosine_topk_oracle_sql(
    query_ids: list[int],
    k: int = 5,
    centroid_ids: tuple[int, ...] = IVF_CENTROID_IDS,
) -> str:
    qids = ", ".join(str(i) for i in query_ids)
    cids = ", ".join(str(i) for i in centroid_ids)
    return f"""
WITH cent AS (SELECT vec_id AS cent_id, embedding AS cent_vec FROM embeddings
              WHERE vec_id IN ({cids})),
scored AS (
  SELECT e.vec_id, e.embedding, cent.cent_id,
         round({_cos_sql('e.embedding', 'cent.cent_vec')}, 6) AS c
  FROM embeddings e CROSS JOIN cent
),
r0 AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY c DESC, cent_id ASC) AS rn
  FROM scored
),
assigned AS (SELECT vec_id, embedding, cent_id AS cell FROM r0 WHERE rn = 1),
q AS (SELECT vec_id AS q_id, embedding AS q_vec, cell FROM assigned
      WHERE vec_id IN ({qids})),
pairs AS (
  SELECT q.q_id, c.vec_id AS neighbor_id,
         round({_cos_sql('q.q_vec', 'c.embedding')}, 6) AS cos
  FROM q JOIN assigned c ON c.cell = q.cell AND c.vec_id <> q.q_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM pairs
)
SELECT q_id, neighbor_id, cos, rank::INT AS rank FROM r WHERE rank <= {k}
"""


def ann_multiprobe_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe ANN top-k: candidates from the query's hyperplane
    bucket AND every bucket at Hamming distance 1 (flip each of the
    N_HYPERPLANES bits) — the standard multi-probe LSH recall fix
    (Lv et al., VLDB 2007).

    Motivated by measurement: ``embedding_ann_recall`` shows the exact-
    bucket probe recalls ~0-1 of the true top-5 on this corpus — with a
    near-isotropic embedding distribution, true neighbors sit at cosine
    ~0.3, where the per-plane agreement probability (1 - theta/pi ~ 0.6)
    makes an 8-bit exact bucket match vanishingly rare.  Probing the 9
    nearest buckets multiplies candidate volume by ~9 (still a ~1/28
    corpus fraction) and recovers most neighbors one flipped plane away.

    Plan identical to :func:`ann_cosine_topk` except the broadcast query
    side explodes to 9 (q, bucket) probe rows; each corpus vector lives
    in exactly one bucket, so probes are disjoint and no candidate dedup
    is needed.
    """
    from pyspark.sql import Window

    bucketed = emb.select(
        F.col(id_col), F.col(vec_col), hyperplane_bucket(F.col(vec_col)).alias("bucket")
    )
    probes = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << p))
            for p in range(N_HYPERPLANES)
        ],
    )
    q = (
        bucketed.where(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode(probes).alias("bucket"),
        )
    )
    c = bucketed.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .where(F.col("q_id") != F.col("neighbor_id"))
        .select(
            "q_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


def ann_cosine_topk_oracle_sql(query_ids: list[int], k: int = 5) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH b AS (SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
           FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS q_vec, bucket FROM b
      WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.q_id, c.vec_id AS neighbor_id,
         round({_cos_sql('q.q_vec', 'c.embedding')}, 6) AS cos
  FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id <> q.q_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT q_id, neighbor_id, cos, rank::INT AS rank FROM r WHERE rank <= {k}
"""


def ann_multiprobe_topk_oracle_sql(query_ids: list[int], k: int = 5) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    probe_list = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << p})" for p in range(N_HYPERPLANES)]
    )
    return f"""
WITH b AS MATERIALIZED (SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
           FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS q_vec,
             unnest([{probe_list}]) AS bucket
      FROM b WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.q_id, c.vec_id AS neighbor_id,
         round({_cos_sql('q.q_vec', 'c.embedding')}, 6) AS cos
  FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id <> q.q_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT q_id, neighbor_id, cos, rank::INT AS rank FROM r WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# cross-source corpus overlap
# ---------------------------------------------------------------------------


def source_overlap_jaccard(
    df: DataFrame, text_col: str, source_col: str = "source"
) -> DataFrame:
    """(src_a, src_b, n_a, n_b, n_common, jaccard) — distinct-shingle-set
    Jaccard between every pair of corpus sources: the "how much does
    CommonCrawl overlap GitHub" question that drives source-level mixing
    and dedup budgeting.

    Shape: explode each doc's distinct shingles, reduce to the distinct
    (source, shingle) relation — at most |sources| rows per shingle — then
    one self-equi-join on the shingle keyed by ``src_a < src_b``.  The
    join input is already deduplicated, so a shingle shared by all sources
    contributes |sources|^2 rows, never n_docs^2; with the handful of
    sources a real corpus has, candidate volume is linear in distinct
    shingles.  At 100 TB the (source, shingle) relation is the thing to
    stage to parquet (same argument as write_signatures_table).
    """
    # four consumers (both self-join sides + the per-source sizes used
    # twice): checkpoint to a leaf, not a lazy persist that re-inlines
    # the shingle explode per reference (r10)
    sh = (
        df.select(
            F.col(source_col).alias("src"),
            F.explode(
                F.array_distinct(_shingles_or_whole(F.col(text_col)))
            ).alias("s"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = sh.groupBy("src").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        sh.select(F.col("src").alias("src_a"), "s")
        .join(sh.select(F.col("src").alias("src_b"), "s"), "s")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes.select(F.col("src").alias("src_a"), F.col("n").alias("n_a")), "src_a")
        .join(sizes.select(F.col("src").alias("src_b"), F.col("n").alias("n_b")), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            "n_common",
            r6n(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )


def source_overlap_jaccard_oracle_sql() -> str:
    return f"""
WITH t AS (SELECT source, {_NORM_SQL} AS norm, {_TOKS_SQL} AS toks FROM documents),
shl AS (
  SELECT source,
         CASE WHEN len(toks) >= 3
              THEN list_transform(generate_series(1, len(toks) - 2),
                                  i -> array_to_string(toks[i:i+2], ' '))
              ELSE [norm] END AS shingles
  FROM t
),
e AS (
  SELECT DISTINCT src, s FROM (
    SELECT source AS src, unnest(list_distinct(shingles)) AS s FROM shl
  )
),
sizes AS (SELECT src, count(*) AS n FROM e GROUP BY 1),
inter AS (
  SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_common
  FROM e a JOIN e b ON a.s = b.s AND a.src < b.src
  GROUP BY 1, 2
)
SELECT i.src_a, i.src_b, sa.n AS n_a, sb.n AS n_b, i.n_common,
       {r6n_sql('i.n_common::DOUBLE / (sa.n + sb.n - i.n_common)::DOUBLE')} AS jaccard
FROM inter i
JOIN sizes sa ON sa.src = i.src_a
JOIN sizes sb ON sb.src = i.src_b
"""


# ---------------------------------------------------------------------------
# leakage-safe train/val/test split
# ---------------------------------------------------------------------------


def leakage_safe_split(
    df: DataFrame, text_col: str, id_col: str, threshold: float = 0.5
) -> DataFrame:
    """(id, component, split) — train/val/test assignment that cannot leak
    near-duplicates across splits: hash the *near-dup component id*, not
    the document id, so every document in a connected near-dup cluster
    lands in the same split by construction (doc-level hash splits put
    ~near-identical train/test twins on opposite sides — the classic
    contamination bug a doc-hash split can't see).

    80/10/10 on ``md5(component)``: the same :func:`hash60` primitive as
    the dedup keys, mod 100 — deterministic, engine-portable, and
    independent of corpus order.  Cost is one :func:`near_dup_components`
    run plus a map; at 100 TB the component relation is the already-staged
    dedup output, so the split itself is a free column.
    """
    comp = near_dup_components(df, text_col, id_col, threshold)
    h = hash60(F.col("component").cast("string")) % 100
    return comp.select(
        id_col,
        "component",
        F.when(h < 80, F.lit("train"))
        .when(h < 90, F.lit("validation"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def leakage_safe_split_oracle_sql(threshold: float = 0.5) -> str:
    """Recursive-CTE components (same body as
    :func:`near_dup_components_oracle_sql`) + the md5-mod-100 split rule."""
    comp = near_dup_components_oracle_sql(threshold).strip()
    h = f"({_hash60_sql('component::VARCHAR')} % 100)"
    return f"""
WITH comp AS ({comp})
SELECT doc_id, component,
       CASE WHEN {h} < 80 THEN 'train'
            WHEN {h} < 90 THEN 'validation'
            ELSE 'test' END AS split
FROM comp
"""


# ---------------------------------------------------------------------------
# asymmetric (two-relation) MinHash-LSH: ingest-time dedup, fuzzy decontam
# ---------------------------------------------------------------------------


def asymmetric_near_dup_pairs(
    sigs_a: DataFrame, sigs_b: DataFrame, id_col: str, threshold: float = 0.5
) -> DataFrame:
    """(id_a, id_b, est_jaccard) — near-dup pairs BETWEEN two signature
    relations (never within one): the ingest-time shape, probing a new
    batch (``sigs_b``) against the existing corpus (``sigs_a``) without
    ever re-pairing the corpus against itself.

    Same banded equi-join as :func:`lsh_candidate_pairs`, but the two
    sides are distinct relations, so candidate volume is
    |batch ∩ buckets| — at 100 TB the corpus side is the parquet
    signature stage (:func:`write_signatures_table`) and a daily ingest
    touches only the buckets its batch lands in.  est_jaccard is the
    fraction of equal MinHash components (k = 16 divides a power of
    two, so the ratio is exactly representable and hash-stable).
    """
    def bands_of(sigs: DataFrame, out: str) -> DataFrame:
        return sigs.select(
            F.col(id_col).alias(out),
            F.posexplode(
                _bind(
                    F.col("sig"),
                    lambda s: F.array(*[_band_key(s, b) for b in range(LSH_BANDS)]),
                )
            ).alias("band_id", "band_key"),
        )

    cand = (
        bands_of(sigs_a, "id_a")
        .join(bands_of(sigs_b, "id_b"), ["band_id", "band_key"])
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sigs_a.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs_b.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    est = F.aggregate(
        F.zip_with(
            F.col("sig_a"), F.col("sig_b"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("double") / F.lit(float(MINHASH_K))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", F.round(est, 6))
        .where(F.col("est_jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "est_jaccard")
    )


def _two_sided_sig_cte(raw_sql: str) -> str:
    """CTE chain over ``raw(id, side, text)`` (side 0 = corpus/a,
    1 = batch/b) ending in ``sigs(id, side, sig)`` + the asymmetric
    ``cand`` — the DuckDB twin of :func:`asymmetric_near_dup_pairs`'s
    candidate generation."""
    perm_exprs = ", ".join(
        f"list_min(list_transform(base, x -> ({a} * x + {b}) % {MERSENNE_P}))"
        for a, b in MINHASH_PERMS
    )
    band_selects = " UNION ALL ".join(
        f"SELECT id, side, {b} AS band_id, "
        f"array_to_string(sig[{b * LSH_ROWS + 1}:{(b + 1) * LSH_ROWS}], ',') AS band_key "
        f"FROM sigs"
        for b in range(LSH_BANDS)
    )
    return f"""
raw AS ({raw_sql}),
t AS (SELECT id, side, {_NORM_SQL} AS norm, {_TOKS_SQL} AS toks FROM raw),
sh2 AS (
  SELECT id, side,
         CASE WHEN len(toks) >= 3
              THEN list_transform(generate_series(1, len(toks) - 2),
                                  i -> array_to_string(toks[i:i+2], ' '))
              ELSE [norm] END AS shingles
  FROM t
),
based AS (
  SELECT id, side,
         list_transform(shingles, s -> {_hash60_sql('s')} % {MERSENNE_P}) AS base
  FROM sh2
),
sigs AS (SELECT id, side, [{perm_exprs}] AS sig FROM based),
bands AS ({band_selects}),
cand AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
  WHERE a.side = 0 AND b.side = 1
  GROUP BY 1, 2
)
"""


def asymmetric_near_dup_oracle_sql(raw_sql: str, threshold: float = 0.5) -> str:
    """Full pair-level oracle over :func:`_two_sided_sig_cte`."""
    eq = f"""list_sum(list_transform(generate_series(1, {MINHASH_K}),
        i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))"""
    return f"""
WITH {_two_sided_sig_cte(raw_sql)}
SELECT cand.id_a, cand.id_b,
       round({eq}::DOUBLE / {MINHASH_K}.0, 6) AS est_jaccard
FROM cand
JOIN sigs sa ON sa.id = cand.id_a AND sa.side = 0
JOIN sigs sb ON sb.id = cand.id_b AND sb.side = 1
WHERE {eq}::DOUBLE / {MINHASH_K}.0 >= {threshold}
"""


#: bump when the signature definition changes (hash60, MINHASH_PERMS,
#: shingling, simhash32) — stale stage tables are invalidated by token
SIGNATURE_STAGE_VERSION = 1


def ensure_signatures_table(
    spark,
    df: DataFrame,
    path: str,
    *,
    text_col: str,
    id_col: str,
    source_token: str = "",
) -> DataFrame:
    """Idempotent form of :func:`write_signatures_table`: build the stage
    only when no stage for (signature-code version, ``source_token``)
    exists at ``path``, then read it back.

    ``source_token`` should identify the corpus snapshot (file
    size+mtime locally; table version / snapshot id on a real
    lakehouse).  The validity marker is an underscore-prefixed file
    inside the parquet directory, which Spark's scans ignore.  This is
    the ingest-time amortization contract: signature compute is paid
    once per corpus snapshot, and every consumer — banding join,
    threshold sweep, incremental batch probe — pays only the columnar
    read.  Single-writer assumption (ingest jobs are serialized per
    table); concurrent writers would need a lock or an atomic rename.
    """
    import hashlib
    import os

    token = f"v{SIGNATURE_STAGE_VERSION}-{source_token}"
    marker = os.path.join(
        path, "_stage_token_" + hashlib.md5(token.encode()).hexdigest()[:16]
    )
    if not os.path.exists(marker):
        write_signatures_table(df, path, text_col=text_col, id_col=id_col)
        with open(marker, "w") as f:
            f.write(token + "\n")
    return read_signatures_table(spark, path)


# ---------------------------------------------------------------------------
# LSH quality evaluation (precision/recall vs exact ground truth)
# ---------------------------------------------------------------------------


def lsh_eval_metrics(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    eval_max_df: int = 256,
) -> DataFrame:
    """One row — (n_truth, n_pred, tp, fp, fn, precision, recall): the
    end-to-end quality of the MinHash-LSH near-dup pipeline (banding
    recall AND signature-estimator bias together) measured against exact
    distinct-shingle Jaccard ground truth at the same threshold.

    This is the tuning harness for (k, bands, rows, threshold): run it on
    a bounded sample when the corpus is large — ground truth generates
    candidates from an exact shared-shingle inverted index, which is
    linear in shingles but quadratic in documents sharing a hot
    boilerplate shingle, so unlike the production LSH path it is an
    *evaluation* cost, paid on samples.  As defense-in-depth the index
    drops stop shingles with document frequency > ``eval_max_df``
    (mirroring ``ngram_containment_pairs``), bounding any hot key to
    ≤ eval_max_df² candidates; the default 256 is 10× the maximum df
    observed at sf0.1 (25), so current-sf ground truth is unchanged — a
    near-dup pair sharing ONLY >256-df boilerplate shingles would be the
    only miss.  Sets and metrics are exact integers; the two ratios are
    boundary-nudged.
    """
    # r10: the truth leg used to materialize distinct candidate pairs and
    # join each side's FULL shingle array back for array_intersect/union —
    # every candidate row shuttled two string arrays through two shuffles.
    # The same integers come straight from the inverted index (guide §2.3:
    # shuffle decisions, not payloads): the rare-shingle self-join counts
    # each pair's distinct shared rare shingles in ONE partial-aggregated
    # groupBy (the index is distinct per (id, s)), the normally-empty
    # df>cap stop-shingle arrays are the only per-pair array work left
    # (inter = c_rare + |stop_a ∩ stop_b| — every shingle is rare XOR
    # stop), and union = n_a + n_b − inter (arrays are distinct).  All
    # counts are the same exact integers; the threshold compare divides
    # the same doubles, so truth is bit-identical to the array form.
    sh = widen_for_compute(df).select(
        F.col(id_col).alias("id"),
        F.array_distinct(_shingles_or_whole(F.col(text_col))).alias("shs"),
    ).persist()
    ix = sh.select("id", F.explode("shs").alias("s"))
    dfreq = ix.groupBy("s").agg(F.count(F.lit(1)).alias("df_s"))
    rare = dfreq.where(F.col("df_s") <= eval_max_df).select("s")
    rix = ix.join(rare, "s")
    c_rare = (
        rix.select(F.col("id").alias("id_a"), "s")
        .join(rix.select(F.col("id").alias("id_b"), "s"), "s")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("c_rare"))
    )
    stop = dfreq.where(F.col("df_s") > eval_max_df).select("s")
    empty_s = F.expr("array()").cast("array<string>")
    meta = (
        sh.select("id", F.size("shs").alias("n"))
        .join(
            ix.join(stop, "s").groupBy("id").agg(F.collect_list("s").alias("nr")),
            "id",
            "left",
        )
        .select("id", "n", F.coalesce("nr", empty_s).alias("nr"))
    )
    a = meta.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"), F.col("nr").alias("nr_a"))
    b = meta.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"), F.col("nr").alias("nr_b"))
    inter = (
        F.col("c_rare") + F.size(F.array_intersect("nr_a", "nr_b"))
    ).cast("double")
    union = (F.col("n_a") + F.col("n_b")).cast("double") - inter
    truth = (
        c_rare.join(a, "id_a").join(b, "id_b")
        .where(inter / union >= F.lit(threshold))
        .select("id_a", "id_b")
    )
    pred = near_dup_pairs(df, text_col, id_col, threshold).select(
        "id_a", "id_b"
    )
    joined = truth.withColumn("t", F.lit(1)).join(
        pred.withColumn("p", F.lit(1)), ["id_a", "id_b"], "full_outer"
    )
    agg = joined.agg(
        F.sum(F.coalesce("t", F.lit(0))).alias("n_truth"),
        F.sum(F.coalesce("p", F.lit(0))).alias("n_pred"),
        F.sum(
            F.when(F.col("t").isNotNull() & F.col("p").isNotNull(), 1).otherwise(0)
        ).alias("tp"),
        F.sum(
            F.when(F.col("t").isNull() & F.col("p").isNotNull(), 1).otherwise(0)
        ).alias("fp"),
        F.sum(
            F.when(F.col("t").isNotNull() & F.col("p").isNull(), 1).otherwise(0)
        ).alias("fn"),
    )
    return agg.select(
        "n_truth",
        "n_pred",
        "tp",
        "fp",
        "fn",
        r6n(F.col("tp").cast("double") / F.col("n_pred").cast("double")).alias(
            "precision"
        ),
        r6n(F.col("tp").cast("double") / F.col("n_truth").cast("double")).alias(
            "recall"
        ),
    )


def lsh_eval_metrics_oracle_sql(
    threshold: float = 0.5, eval_max_df: int = 256
) -> str:
    eq = f"""list_sum(list_transform(generate_series(1, {MINHASH_K}),
        i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))"""
    return f"""
WITH {_sig_cte()}, {_bands_cte()},
pred AS (
  SELECT cand.id_a, cand.id_b
  FROM cand
  JOIN sig sa ON sa.id = cand.id_a
  JOIN sig sb ON sb.id = cand.id_b
  WHERE {eq}::DOUBLE / {MINHASH_K}.0 >= {threshold}
),
shs AS (
  SELECT id, list_distinct(shingles) AS shs FROM sh
),
ix0 AS (SELECT id, unnest(shs) AS s FROM shs),
rare_s AS (SELECT s FROM ix0 GROUP BY s HAVING count(*) <= {eval_max_df}),
ix AS (SELECT id, s FROM ix0 JOIN rare_s USING (s)),
tcand AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM ix a JOIN ix b ON a.s = b.s AND a.id < b.id
  GROUP BY 1, 2
),
truth AS (
  SELECT t.id_a, t.id_b
  FROM tcand t
  JOIN shs xa ON xa.id = t.id_a
  JOIN shs xb ON xb.id = t.id_b
  WHERE len(list_intersect(xa.shs, xb.shs))::DOUBLE
        / len(list_distinct(list_concat(xa.shs, xb.shs)))::DOUBLE >= {threshold}
),
j AS (
  SELECT coalesce(t.id_a, p.id_a) AS id_a, coalesce(t.id_b, p.id_b) AS id_b,
         t.id_a IS NOT NULL AS in_t, p.id_a IS NOT NULL AS in_p
  FROM truth t FULL OUTER JOIN pred p
    ON t.id_a = p.id_a AND t.id_b = p.id_b
),
m AS (
  SELECT sum(CASE WHEN in_t THEN 1 ELSE 0 END)::BIGINT AS n_truth,
         sum(CASE WHEN in_p THEN 1 ELSE 0 END)::BIGINT AS n_pred,
         sum(CASE WHEN in_t AND in_p THEN 1 ELSE 0 END)::BIGINT AS tp,
         sum(CASE WHEN NOT in_t AND in_p THEN 1 ELSE 0 END)::BIGINT AS fp,
         sum(CASE WHEN in_t AND NOT in_p THEN 1 ELSE 0 END)::BIGINT AS fn
  FROM j
)
SELECT n_truth, n_pred, tp, fp, fn,
       {r6n_sql('tp::DOUBLE / n_pred::DOUBLE')} AS precision,
       {r6n_sql('tp::DOUBLE / n_truth::DOUBLE')} AS recall
FROM m
"""


# ---------------------------------------------------------------------------
# exact set-similarity self-join via prefix filtering (PPJoin-style)
# ---------------------------------------------------------------------------


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold_pct: int = 60,
) -> DataFrame:
    """EXACT Jaccard similarity self-join over distinct 3-word SHINGLE
    sets via prefix filtering (the AllPairs/PPJoin family, Bayardo et
    al. WWW'07) — the deterministic sibling of the MinHash-LSH candidate
    pipeline: no hashing, no probability of a missed pair, and the same
    shingle universe the MinHash signatures estimate (distinct token
    sets are uselessly dense on templated corpora — measured 7M
    qualifying pairs at sf0.1 — while shingle sets are discriminative).

    Shingles get a global rarity rank (ascending document frequency; the
    two-phase ``functions.distribution.global_rank``, no single-partition
    window); each doc's prefix is its ``sz - ceil(theta*sz) + 1``
    rarest shingles.  The prefix-filter lemma guarantees any pair with
    J >= theta shares a token within BOTH prefixes (with a consistent
    total order, if |A∩B| >= alpha then prefixes of length
    |x| - alpha + 1 intersect; here alpha = ceil(theta*max(|A|,|B|)) >=
    each per-set bound), so the equi-join on prefix tokens — rare tokens,
    hence few collisions — produces a candidate superset, and the exact
    intersection count then keeps ``100*inter >= pct*(union)``: an
    INTEGER threshold test, no float boundary to disagree on.

    Scale shape: the only corpus-sized shuffles are the (id, token)
    explode and its frequency/prefix joins; the quadratic risk lives
    only in prefix-token collisions, which the rare-first ordering
    minimizes (the classic result: cost tracks the true result size on
    non-pathological corpora).  Returns (id_a, id_b, n_inter, jacc
    rounded 6 dp) with id_a < id_b.
    """
    from ..functions.distribution import global_rank
    from pyspark.sql import Window

    pct = int(threshold_pct)
    from ..functions.text import shingles_or_whole

    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles_or_whole(text_col))).alias("token"),
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    ranked = global_rank(
        freq, [F.col("df_t").asc(), F.col("token").asc()], "trank"
    ).select("token", "trank")
    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    wd = Window.partitionBy("id").orderBy(F.col("trank").asc())
    prefix = (
        tok.join(ranked, "token")
        .withColumn("pos", F.row_number().over(wd))
        .join(sizes, "id")
        .where(
            F.col("pos")
            <= F.col("sz")
            - F.floor((F.lit(pct) * F.col("sz") + 99) / 100)
            + 1
        )
        .select("id", "token")
    )
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "token")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    ta = tok.select(F.col("id").alias("id_a"), "token")
    tb = tok.select(F.col("id").alias("id_b"), "token")
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    union_sz = F.col("sz_a") + F.col("sz_b") - F.col("n_inter")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .where(F.lit(100) * F.col("n_inter") >= F.lit(pct) * union_sz)
        .select(
            "id_a",
            "id_b",
            "n_inter",
            r6n(F.col("n_inter").cast("double") / union_sz).alias("jacc"),
        )
    )


def prefix_filter_jaccard_oracle_sql(threshold_pct: int = 60) -> str:
    """Ground-truth oracle: ALL-PAIRS exact Jaccard at the same integer
    threshold — so the driver hash also certifies the prefix filter's
    no-false-negative lemma, not just the arithmetic."""
    pct = int(threshold_pct)
    return f"""
WITH t0 AS (SELECT doc_id, {_NORM_SQL} AS norm, {_TOKS_SQL} AS toks FROM documents),
t AS (
  SELECT doc_id,
         list_distinct(
           CASE WHEN len(toks) >= 3
                THEN list_transform(generate_series(1, len(toks) - 2),
                                    i -> array_to_string(toks[i:i+2], ' '))
                ELSE [norm] END) AS grams
  FROM t0
),
e AS (SELECT doc_id AS id, unnest(grams) AS token FROM t),
sz AS (SELECT id, count(*) AS sz FROM e GROUP BY 1),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
  FROM e a JOIN e b ON a.token = b.token AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_inter,
       {r6n_sql('n_inter::DOUBLE / (sa.sz + sb.sz - n_inter)')} AS jacc
FROM inter
JOIN sz sa ON sa.id = id_a
JOIN sz sb ON sb.id = id_b
WHERE 100 * n_inter >= {pct} * (sa.sz + sb.sz - n_inter)
"""


# ---------------------------------------------------------------------------
# PageRank over the near-dup candidate graph
# ---------------------------------------------------------------------------


def near_dup_pagerank(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    n_iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over the (symmetric) near-dup candidate graph, restricted
    to non-isolated nodes: the eigenvector upgrade of the degree
    histogram for boilerplate hunting — a template hub scores high even
    when its individual edges are spread across many mid-degree
    neighbors.

    r_{k+1}(v) = round6((1-d)/N + d * sum_{u~v} r_k(u) / deg(u)),
    uniform init 1/N; restricting to nodes with >= 1 edge makes the
    graph dangling-free, so no leaked-mass correction term.  Per-round
    trajectory rounding (the k-means rule) keeps both engines on the
    identical path, so the whole iteration is oracle-hashable.

    Scale shape: each round is ONE edge-keyed join + ONE aggregate
    (the standard distributed PR step); the edge relation is computed
    once and persisted via the tracked-cache registry; iterations are a
    FIXED small unroll (3), so the logical plan grows linearly and needs
    no checkpoint truncation (the label-propagation loop's localCheckpoint
    handles the unbounded-iteration case).
    """
    from ..cache import persist_tracked

    pairs = near_dup_pairs(df, text_col, id_col, threshold).select("id_a", "id_b")
    # eager checkpoint truncates the LSH subtree: a lazy persist inlines
    # it at every one of the ~7 per-round references in the analyzed
    # plan (measured: the truncation alone is a ~1.6x win; per-round
    # exchanges of the tiny coalesced edge relation are cheap, so no
    # fixed-count repartition is layered on top — see components note)
    edges = persist_tracked(
        pairs.union(
            pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("id_a").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col("id_a").alias("id"), "deg")
    n = nodes.agg(F.count(F.lit(1)).alias("n"))
    r = (
        nodes.join(F.broadcast(n))
        .select("id", "deg", r6n(F.lit(1.0) / F.col("n")).alias("rank"))
    )
    for _ in range(n_iters):
        contrib = (
            edges.join(r, edges.id_a == r.id)
            .select(F.col("id_b").alias("id"), (F.col("rank") / F.col("deg")).alias("w"))
            .groupBy("id")
            .agg(F.sum("w").alias("c"))
        )
        r = (
            nodes.join(F.broadcast(n))
            .join(contrib, "id", "left")
            .select(
                "id",
                "deg",
                r6n(
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return r.select(F.col("id").alias(id_col), "deg", "rank")


def near_dup_pagerank_oracle_sql(
    threshold: float = 0.5, n_iters: int = 3, damping: float = 0.85
) -> str:
    """Unrolled-iteration DuckDB mirror; shared relations MATERIALIZED
    (the §9.1 lesson — DuckDB inlines CTEs by default and a relation
    referenced per round would re-run the whole LSH pipeline each time)."""
    eq_terms = f"""list_sum(list_transform(generate_series(1, {MINHASH_K}),
        i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))"""
    parts = [
        f"""pairs AS MATERIALIZED (
  SELECT cand.id_a, cand.id_b FROM cand
  JOIN sig sa ON sa.id = cand.id_a
  JOIN sig sb ON sb.id = cand.id_b
  WHERE {eq_terms}::DOUBLE / {MINHASH_K}.0 >= {threshold}
),
edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
deg AS MATERIALIZED (SELECT src AS id, count(*) AS deg FROM edges GROUP BY 1),
nn AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM deg),
r0 AS MATERIALIZED (
  SELECT id, deg, {r6n_sql('1.0 / nn.n')} AS rank FROM deg, nn
)"""
    ]
    for k in range(1, n_iters + 1):
        step = (
            f"{1.0 - damping} / nn.n + {damping} * coalesce(c.c, 0.0)"
        )
        parts.append(
            f"""c{k} AS MATERIALIZED (
  SELECT e.dst AS id, sum(r.rank / r.deg) AS c
  FROM edges e JOIN r{k - 1} r ON r.id = e.src
  GROUP BY 1
),
r{k} AS MATERIALIZED (
  SELECT d.id, d.deg, {r6n_sql(step)} AS rank
  FROM deg d LEFT JOIN c{k} c USING (id), nn
)"""
        )
    body = ",\n".join(parts)
    return f"""
WITH {_sig_cte()}, {_bands_cte()},
{body}
SELECT id AS doc_id, deg, rank FROM r{n_iters}
"""


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss projection quality harness
# ---------------------------------------------------------------------------


def rp_project(vec: Column) -> Column:
    """array<double>[RP_DIM]: signed random projection y_j = <S_j, x>
    (Achlioptas +-1 rows; S embedded as literals shared with the
    oracle).  Division by sqrt(RP_DIM) is deferred to the distance
    ratio, keeping the projection integer-combination exact."""
    return _bind(
        _as_double(vec),
        lambda v: F.array(
            *[
                _dot(
                    v,
                    F.array(*[F.lit(float(s)) for s in row]),
                )
                for row in RP_SIGNS
            ]
        ),
    )


def _sq_dist_arr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def rp_distortion_stats(
    emb: DataFrame,
    sample_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-row JL distortion report over the sampled pair set:
    (n_pairs, mean/min/max of the squared-distance ratio
    ||Px||^2 / (k * ||x||^2), share within [0.5, 2]).

    The Johnson-Lindenstrauss guarantee made MEASURABLE before anyone
    swaps the 64-dim embedding for the 16-dim sketch in a downstream
    dedup/ANN pass: project once per vector (a k x d literal-matrix
    combination inside codegen), pair the SAMPLE (eval-on-samples, the
    SURVEY §9.5 convention), and reduce to one stats row.  At 100 TB
    the projection is a map-only pass; only the fixed sample pairs up.
    """
    v = emb.where(F.col(id_col).isin(sample_ids)).select(
        F.col(id_col).alias("vid"),
        _as_double(F.col(vec_col)).alias("vec"),
        rp_project(F.col(vec_col)).alias("proj"),
    )
    a = v.select(
        F.col("vid").alias("id_a"),
        F.col("vec").alias("vec_a"),
        F.col("proj").alias("proj_a"),
    )
    b = v.select(
        F.col("vid").alias("id_b"),
        F.col("vec").alias("vec_b"),
        F.col("proj").alias("proj_b"),
    )
    from ..functions.rounding import r6n

    ratio = (
        _sq_dist_arr(F.col("proj_a"), F.col("proj_b")) / F.lit(float(RP_DIM))
    ) / _sq_dist_arr(F.col("vec_a"), F.col("vec_b"))
    pairs = (
        F.broadcast(a)
        .join(b, F.col("id_a") < F.col("id_b"))
        .where(_sq_dist_arr(F.col("vec_a"), F.col("vec_b")) > 0)
        .select(ratio.alias("r"))
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        r6n(F.avg("r")).alias("mean_ratio"),
        r6n(F.min("r")).alias("min_ratio"),
        r6n(F.max("r")).alias("max_ratio"),
        r6n(
            F.sum(((F.col("r") >= 0.5) & (F.col("r") <= 2.0)).cast("int"))
            / F.count(F.lit(1))
        ).alias("frac_within_2x"),
    )


def rp_distortion_oracle_sql(sample_ids: list[int], dim: int = EMBEDDING_DIM) -> str:
    """DuckDB mirror of :func:`rp_distortion_stats` with the same
    literal sign matrix."""
    from ..functions.rounding import r6n_sql

    ids = ", ".join(str(i) for i in sample_ids)
    signs = (
        "["
        + ", ".join(
            "[" + ", ".join(f"{float(s)}" for s in row) + "]" for row in RP_SIGNS
        )
        + "]"
    )
    return f"""
WITH s AS (SELECT {signs}::DOUBLE[][] AS m),
v AS (
  SELECT vec_id AS vid,
         list_transform(embedding, x -> x::DOUBLE) AS vec,
         list_transform(generate_series(1, {RP_DIM}),
           j -> list_sum(list_transform(generate_series(1, {dim}),
                  i -> embedding[i]::DOUBLE * m[j][i]))) AS proj
  FROM embeddings, s WHERE vec_id IN ({ids})
),
p AS (
  SELECT
    list_sum(list_transform(generate_series(1, {RP_DIM}),
      k -> (a.proj[k] - b.proj[k]) * (a.proj[k] - b.proj[k]))) / {float(RP_DIM)} AS pd,
    list_sum(list_transform(generate_series(1, {dim}),
      i -> (a.vec[i] - b.vec[i]) * (a.vec[i] - b.vec[i]))) AS od
  FROM v a JOIN v b ON a.vid < b.vid
),
r AS (SELECT pd / od AS r FROM p WHERE od > 0)
SELECT count(*) AS n_pairs,
       {r6n_sql('avg(r)')} AS mean_ratio,
       {r6n_sql('min(r)')} AS min_ratio,
       {r6n_sql('max(r)')} AS max_ratio,
       {r6n_sql('sum(CASE WHEN r >= 0.5 AND r <= 2.0 THEN 1 ELSE 0 END)::DOUBLE / count(*)')} AS frac_within_2x
FROM r
"""


# ---------------------------------------------------------------------------
# candidate-graph PageRank (integer fixed-point, oracle-exact)
# ---------------------------------------------------------------------------

#: PageRank mass scale: ranks live in integer units of 1e-12 so every
#: per-round contribution (pr DIV deg) and damping step ((15*base +
#: 85*inflow) DIV 100) is INTEGER arithmetic — bit-identical across
#: engines and partition orders, with no float drift to amplify over
#: the iteration.  Total mass <= 1e12 regardless of graph size, so all
#: sums stay far inside int64.
PAGERANK_SCALE = 10**12


def pagerank_topn(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    rounds: int = 6,
    n_top: int = 20,
) -> DataFrame:
    """(rank, doc_id, pr_int, pr) — top-``n_top`` PageRank (Brin & Page
    1998, damping 0.85) over the symmetric near-dup candidate graph:
    the centrality lens on duplication — a high-PR document is the hub
    its template family copies from, the thing to keep (or to blame)
    when a near-dup cluster collapses.

    Determinism is structural, not numeric: rank mass is integer
    micro-units (``PAGERANK_SCALE``), every round's contribution uses
    integer division (both engines floor identically), so the whole
    trajectory is EXACT and the oracle hash certifies all ``rounds``
    iterations.  Scale shape: per round one hash join (edges x ranks,
    both id-keyed) + one aggregate; edge relation localCheckpoint-ed
    once (LSH-pruned, never all-pairs); top-n via sort+limit
    (TakeOrderedAndProject, no global single-partition window)."""
    pairs = near_dup_pairs(df, text_col, id_col, threshold).select(
        "id_a", "id_b"
    )
    edges = pairs.union(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).distinct()
    deg = edges.groupBy("id_a").agg(F.count(F.lit(1)).alias("deg"))
    ew = (
        edges.join(deg, "id_a")
        .select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "deg"
        )
        .localCheckpoint(eager=True)
    )
    nodes = deg.select(F.col("id_a").alias("v")).localCheckpoint(eager=True)
    ncnt = nodes.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    base = F.expr(f"CAST({PAGERANK_SCALE} AS BIGINT) div n_nodes")
    pr = (
        nodes.crossJoin(F.broadcast(ncnt))
        .select("v", base.alias("pr"))
        .localCheckpoint(eager=True)
    )
    # r11: rounds run under loop_conf (AQE off, leaf-derived static
    # partitions) with LAZY checkpoints — the near-dup graph's edge and
    # rank relations are tiny (LSH-pruned), so static planning of the
    # per-round joins is safe (unlike the corpus-sized facility-location
    # coverage join, where this conversion was measured 2x WORSE and
    # reverted), and the 6 per-round eager checkpoint job storms
    # collapse into the final consumer's job chain.
    from ..cache import loop_conf

    with loop_conf(ew.sparkSession, ew, nodes, pr):
        for _ in range(rounds):
            inflow = (
                ew.join(pr, ew.src == pr.v)
                .groupBy("dst")
                .agg(F.sum(F.expr("pr div deg")).cast("long").alias("inflow"))
            )
            pr = (
                nodes.crossJoin(F.broadcast(ncnt))
                .join(inflow, F.col("v") == F.col("dst"), "left")
                .select(
                    "v",
                    F.expr(
                        f"CAST((15 * (CAST({PAGERANK_SCALE} AS BIGINT) div n_nodes)"
                        f" + 85 * coalesce(inflow, CAST(0 AS BIGINT))) div 100"
                        " AS BIGINT)"
                    ).alias("pr"),
                )
                .localCheckpoint(eager=False)
            )
    top = pr.orderBy(F.col("pr").desc(), F.col("v").asc()).limit(n_top)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("pr").desc(), F.col("v").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select(
            "rank",
            F.col("v").alias("doc_id"),
            F.col("pr").alias("pr_int"),
            F.round(F.col("pr") / F.lit(float(PAGERANK_SCALE)), 6).alias("pr"),
        )
    )


def pagerank_topn_oracle_sql(
    threshold: float = 0.5, rounds: int = 6, n_top: int = 20
) -> str:
    """Unrolled integer-arithmetic mirror of :func:`pagerank_topn`."""
    parts = [
        f"""e0 AS MATERIALIZED (
  SELECT id_a, id_b FROM prs UNION SELECT id_b, id_a FROM prs
),
deg AS MATERIALIZED (SELECT id_a AS src, count(*)::BIGINT AS deg FROM e0 GROUP BY 1),
nodes AS (SELECT src AS v FROM deg),
ncnt AS (SELECT count(*)::BIGINT AS n_nodes FROM nodes),
pr0 AS (SELECT v, {PAGERANK_SCALE}::BIGINT // n_nodes AS pr FROM nodes, ncnt)"""
    ]
    for r in range(rounds):
        parts.append(
            f"""in{r} AS (
  SELECT e.id_b AS dst, sum(p.pr // d.deg)::BIGINT AS inflow
  FROM e0 e JOIN deg d ON d.src = e.id_a JOIN pr{r} p ON p.v = e.id_a
  GROUP BY 1
),
pr{r + 1} AS (
  SELECT nodes.v,
         ((15 * ({PAGERANK_SCALE}::BIGINT // n_nodes)
           + 85 * coalesce(i.inflow, 0)) // 100)::BIGINT AS pr
  FROM nodes CROSS JOIN ncnt LEFT JOIN in{r} i ON i.dst = nodes.v
)"""
        )
    return f"""
WITH {_sig_cte()}, {_bands_cte()},
prs AS (
  SELECT cand.id_a, cand.id_b
  FROM cand
  JOIN sig sa ON sa.id = cand.id_a
  JOIN sig sb ON sb.id = cand.id_b
  WHERE list_sum(list_transform(generate_series(1, {MINHASH_K}),
        i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))::DOUBLE
        / {MINHASH_K}.0 >= {threshold}
),
{",".join(parts)}
SELECT rank, doc_id, pr_int,
       round(pr_int / {float(PAGERANK_SCALE)!r}, 6) AS pr
FROM (
  SELECT row_number() OVER (ORDER BY pr DESC, v ASC)::INT AS rank,
         v AS doc_id, pr AS pr_int
  FROM pr{rounds}
) WHERE rank <= {n_top}
"""


# ---------------------------------------------------------------------------
# k-center greedy coreset (Gonzalez farthest-point selection)
# ---------------------------------------------------------------------------


def kcenter_coreset(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(pick_rank, center_id, radius) — greedy k-center / farthest-point
    coreset selection (Gonzalez 1985; 2-approximation to the optimal
    k-center cover): seed = min id, then ``k-1`` rounds each picking the
    point FARTHEST from everything selected so far (cosine distance
    ``round(1 - cos, 6)``, argmax tie-break min id).  ``radius`` is the
    picked point's distance at pick time — the coverage-radius
    trajectory is non-increasing and row k bounds the whole corpus's
    distance to the coreset.  This is the diversity-first data-selection
    head (pick the examples that EXPAND coverage, the opposite of
    near-dup pruning).

    Scale shape: the state is one (id, vec, min-dist) relation updated
    per round against the single new center (1-row broadcast crossJoin,
    annotated BNLJ) — k passes over the corpus total, each pass one
    projection + one sort+limit(1) argmax (TakeOrderedAndProject, no
    global window); ``localCheckpoint`` per round keeps the plan O(1).
    The oracle's unrolled CTE chain certifies the whole trajectory."""
    pts = emb.select(F.col(id_col).alias("pid"), F.col(vec_col).alias("vec"))
    seed = pts.orderBy(F.col("pid").asc()).limit(1).localCheckpoint(eager=True)
    picks = [
        seed.select(
            F.lit(1).cast("int").alias("pick_rank"),
            F.col("pid").alias("center_id"),
            F.lit(None).cast("double").alias("radius"),
        )
    ]
    state = (
        pts.crossJoin(
            F.broadcast(seed.select(F.col("vec").alias("cvec")))
        )
        .select(
            "pid",
            "vec",
            F.round(F.lit(1.0) - cosine(F.col("vec"), F.col("cvec")), 6).alias(
                "mind"
            ),
        )
        .localCheckpoint(eager=True)
    )
    for r in range(2, k + 1):
        pick = (
            state.orderBy(F.col("mind").desc(), F.col("pid").asc())
            .limit(1)
            .localCheckpoint(eager=True)
        )
        picks.append(
            pick.select(
                F.lit(r).cast("int").alias("pick_rank"),
                F.col("pid").alias("center_id"),
                F.col("mind").alias("radius"),
            )
        )
        if r == k:
            break
        state = (
            state.crossJoin(
                F.broadcast(pick.select(F.col("vec").alias("cvec")))
            )
            .select(
                "pid",
                "vec",
                F.least(
                    F.col("mind"),
                    F.round(
                        F.lit(1.0) - cosine(F.col("vec"), F.col("cvec")), 6
                    ),
                ).alias("mind"),
            )
            .localCheckpoint(eager=True)
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionAll(p)
    return out


def kcenter_coreset_oracle_sql(k: int = 8) -> str:
    """Unrolled greedy trajectory mirror of :func:`kcenter_coreset`."""
    parts = [
        """p AS MATERIALIZED (SELECT vec_id AS pid, embedding AS vec FROM embeddings),
c1 AS (SELECT pid, vec FROM p ORDER BY pid ASC LIMIT 1),
s1 AS MATERIALIZED (
  SELECT p.pid, p.vec,
         round(1.0 - ({_COS}), 6) AS mind
  FROM p, c1
)""".replace("{_COS}", _cos_sql("p.vec", "c1.vec"))
    ]
    for r in range(2, k + 1):
        upd = (
            f"""s{r} AS MATERIALIZED (
  SELECT s.pid, s.vec,
         least(s.mind, round(1.0 - ({_cos_sql(f's.vec', f'c{r}.vec')}), 6)) AS mind
  FROM s{r - 1} s, c{r}
)"""
            if r < k
            else None
        )
        parts.append(
            f"""c{r} AS (SELECT pid, vec, mind FROM s{r - 1}
       ORDER BY mind DESC, pid ASC LIMIT 1)"""
            + (f",\n{upd}" if upd else "")
        )
    rows = ["SELECT 1::INT AS pick_rank, pid AS center_id, NULL::DOUBLE AS radius FROM c1"]
    rows += [
        f"SELECT {r}::INT, pid, mind FROM c{r}" for r in range(2, k + 1)
    ]
    return f"""
WITH {",".join(parts)}
{" UNION ALL ".join(rows)}
"""


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer / MOSS local document fingerprinting)
# ---------------------------------------------------------------------------

#: winnowing window: one fingerprint selected from every WINNOW_W
#: consecutive k-gram hashes (guarantee: any match of length
#: >= W + k - 1 tokens shares a fingerprint)
WINNOW_W = 4
#: bits reserved for the (inverted) position in the packed selection key
_WINNOW_POS_BITS = 22
_WINNOW_POS_MASK = (1 << _WINNOW_POS_BITS) - 1


def winnow_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_shared: int = 2,
    max_df: int = 50,
) -> DataFrame:
    """(id_a, id_b, shared_fps) — candidate pairs sharing >=
    ``min_shared`` winnowing fingerprints (Schleimer, Wilkerson &
    Aiken 2003 — the MOSS algorithm): per document, hash every 3-word
    shingle, slide a ``WINNOW_W``-gram window, and select each window's
    minimum hash with RIGHTMOST tie-break — a position-robust ~1/W
    subsample of the shingle space that still guarantees any shared run
    of >= W+2 tokens produces a shared fingerprint.  The third
    candidate generator next to MinHash-LSH (probabilistic Jaccard) and
    SimHash (Hamming): winnowing is exact-substring-match-driven, the
    right recall shape for clone/quotation detection.

    Determinism: min-with-rightmost-tie is ONE integer ``min`` over the
    packed key ``hash40 * 2^22 + (2^22-1-pos)`` — no argmax ambiguity,
    same integer op in both engines.  Scale shape: shingle hashing is a
    per-doc projection, window selection a per-doc PARTITIONED window,
    fingerprints reduce to distinct (doc, hash) before the equi-join on
    the hash; hub fingerprints (document frequency > ``max_df``,
    boilerplate) are dropped before the join so a viral shingle cannot
    fan out quadratically."""
    kg = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(_shingles_or_whole(F.col(text_col))).alias("pos", "gram"),
    )
    h40 = F.shiftright(hash60(F.col("gram")), 20)
    key = F.shiftleft(h40, _WINNOW_POS_BITS) + (
        F.lit(_WINNOW_POS_MASK) - F.col("pos")
    )
    from pyspark.sql import Window

    part = Window.partitionBy("id")
    frame = part.orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    sel = (
        kg.withColumn("key", key.cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(part))
        .withColumn("selkey", F.min("key").over(frame))
        .where(
            (F.col("pos") <= F.col("n") - WINNOW_W)
            | ((F.col("n") < WINNOW_W) & (F.col("pos") == 0))
        )
    )
    fps = sel.select(
        "id", F.shiftright(F.col("selkey"), _WINNOW_POS_BITS).alias("fp")
    ).distinct()
    rare = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_df)
        .select("fp")
    )
    keep = fps.join(rare, "fp")
    a = keep.select(F.col("id").alias("id_a"), "fp")
    b = keep.select(F.col("id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )


def winnow_pairs_oracle_sql(min_shared: int = 2, max_df: int = 50) -> str:
    h40 = f"({_hash60_sql('gram')} >> 20)"
    return f"""
WITH t AS (SELECT doc_id AS id, {_NORM_SQL} AS norm, {_TOKS_SQL} AS toks
           FROM documents),
sh AS (
  SELECT id,
         CASE WHEN len(toks) >= 3
              THEN list_transform(generate_series(1, len(toks) - 2),
                                  i -> array_to_string(toks[i:i+2], ' '))
              ELSE [norm] END AS shingles
  FROM t
),
kg AS (
  SELECT id, generate_subscripts(shingles, 1) - 1 AS pos,
         unnest(shingles) AS gram
  FROM sh
),
keyed AS (
  SELECT id, pos,
         ({h40} << {_WINNOW_POS_BITS}) + ({_WINNOW_POS_MASK} - pos) AS key,
         count(*) OVER (PARTITION BY id) AS n
  FROM kg
),
sel AS (
  SELECT id, pos, n,
         min(key) OVER (PARTITION BY id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
           AS selkey
  FROM keyed
),
fps AS (
  SELECT DISTINCT id, selkey >> {_WINNOW_POS_BITS} AS fp
  FROM sel
  WHERE pos <= n - {WINNOW_W} OR (n < {WINNOW_W} AND pos = 0)
),
rare AS (SELECT fp FROM fps GROUP BY 1 HAVING count(*) <= {max_df})
SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS shared_fps
FROM fps a JOIN rare USING (fp) JOIN fps b USING (fp)
WHERE a.id < b.id
GROUP BY 1, 2
HAVING count(*) >= {min_shared}
"""


def ppjoin_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold_pct: int = 60,
) -> DataFrame:
    """PPJoin: the POSITION-enhanced prefix-filter exact-Jaccard
    self-join (Xiao, Wang, Lin & Yu, WWW'08) — same result set as
    :func:`prefix_filter_jaccard_pairs` (the positional filter never
    prunes a true pair), strictly fewer candidates reaching the
    verification join.

    Two extra prunes over AllPairs, both exact integer tests:

    * **length filter** on the prefix join: a qualifying pair needs
      ``100*min(sz) >= pct*max(sz)``.
    * **positional filter**: when prefixes share a token at (ascending
      -rarity) positions ``pa`` / ``pb``, the overlap can be at most
      ``1 + min(sz_a - pa, sz_b - pb)``; the pair needs overlap
      ``alpha = ceil(pct*(sz_a+sz_b)/(100+pct))``, so occurrences with
      a smaller upper bound are dropped BEFORE the distinct/verify.

    Scale shape identical to the AllPairs sibling (rare-first two-phase
    global token ranks, equi-join on prefix tokens, candidates-only
    verification); the positional prune cuts the candidate set the
    verify join must hash — the knob that matters when templated
    corpora make prefix tokens collide."""
    from ..functions.distribution import global_rank
    from ..functions.text import shingles_or_whole
    from pyspark.sql import Window

    pct = int(threshold_pct)
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles_or_whole(text_col))).alias(
            "token"
        ),
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    ranked = global_rank(
        freq, [F.col("df_t").asc(), F.col("token").asc()], "trank"
    ).select("token", "trank")
    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    wd = Window.partitionBy("id").orderBy(F.col("trank").asc())
    prefix = (
        tok.join(ranked, "token")
        .withColumn("pos", F.row_number().over(wd))
        .join(sizes, "id")
        .where(
            F.col("pos")
            <= F.col("sz")
            - F.floor((F.lit(pct) * F.col("sz") + 99) / 100)
            + 1
        )
        .select("id", "token", "pos", "sz")
    )
    a = prefix.select(
        F.col("id").alias("id_a"),
        "token",
        F.col("pos").alias("pos_a"),
        F.col("sz").alias("sz_a"),
    )
    b = prefix.select(
        F.col("id").alias("id_b"),
        "token",
        F.col("pos").alias("pos_b"),
        F.col("sz").alias("sz_b"),
    )
    alpha = F.floor(
        (
            F.lit(pct) * (F.col("sz_a") + F.col("sz_b"))
            + F.lit(100 + pct - 1)
        )
        / F.lit(100 + pct)
    )
    ubound = F.lit(1) + F.least(
        F.col("sz_a") - F.col("pos_a"), F.col("sz_b") - F.col("pos_b")
    )
    cand = (
        a.join(b, "token")
        .where(F.col("id_a") < F.col("id_b"))
        # length filter (pair-level, exact integers)
        .where(
            (F.lit(100) * F.col("sz_b") >= F.lit(pct) * F.col("sz_a"))
            & (F.lit(100) * F.col("sz_a") >= F.lit(pct) * F.col("sz_b"))
        )
        # positional filter (occurrence-level upper bound vs alpha)
        .where(ubound >= alpha)
        .select("id_a", "id_b")
        .distinct()
    )
    ta = tok.select(F.col("id").alias("id_a"), "token")
    tb = tok.select(F.col("id").alias("id_b"), "token")
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    union_sz = F.col("sz_a") + F.col("sz_b") - F.col("n_inter")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .where(F.lit(100) * F.col("n_inter") >= F.lit(pct) * union_sz)
        .select(
            "id_a",
            "id_b",
            "n_inter",
            r6n(F.col("n_inter").cast("double") / union_sz).alias("jacc"),
        )
    )
