"""Property-based tests (hypothesis): the JVM Column builders must agree
with the pure-Python reference formulas (_numerics) on arbitrary inputs,
and the pipeline operators must be total on empty inputs.

Spark's partial aggregation sums partitions in a different order than the
sequential Python loop, so float comparisons use 1e-9 relative tolerance
(the same tolerance class the driver's oracle hash relies on via 6-dp
rounding).
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from datafusion_functions_extra_spark import kurtosis, kurtosis_pop, mode_agg, skewness
from datafusion_functions_extra_spark.functions import _numerics as num

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
values = st.lists(st.one_of(finite, st.none()), min_size=0, max_size=40)

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def close(a, b):
    if a is None or b is None:
        return a is None and b is None
    return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)


@given(values)
@SET
def test_moment_builders_match_reference_formulas(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals] or [(None,)], "x double")
    if not vals:
        df = df.where("1=0")
    row = df.agg(
        skewness("x").alias("s"), kurtosis("x").alias("k"), kurtosis_pop("x").alias("kp")
    ).collect()[0]
    assert close(row.s, num.skewness_py(vals))
    assert close(row.k, num.kurtosis_py(vals))
    assert close(row.kp, num.kurtosis_pop_py(vals))


@given(st.lists(st.one_of(st.integers(-50, 50), st.none()), min_size=0, max_size=60))
@SET
def test_mode_agg_matches_reference_formula(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals] or [(None,)], "x int")
    if not vals:
        df = df.where("1=0")
    got = mode_agg(df, None, "x").collect()[0][0]
    assert got == num.mode_py(vals)


# --- totality on empty inputs ------------------------------------------------


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id bigint, text string")


def test_similarity_pipelines_total_on_empty(spark, empty_docs):
    from datafusion_functions_extra_spark.operators import similarity as SIM

    assert SIM.near_dup_pairs(empty_docs, "text", "doc_id").count() == 0
    assert SIM.near_dup_clusters(empty_docs, "text", "doc_id").count() == 0
    assert SIM.simhash_pairs(empty_docs, "text", "doc_id").count() == 0


def test_dedup_and_asof_total_on_empty(spark, empty_docs):
    from datafusion_functions_extra_spark.operators.asof import asof_join
    from datafusion_functions_extra_spark.operators.dedup import exact_dedup

    assert exact_dedup(empty_docs, "text", "doc_id").count() == 0
    left = spark.createDataFrame([], "id bigint, k string, ts timestamp")
    right = spark.createDataFrame([], "k string, ts timestamp, px double")
    assert asof_join(left, right, ["k"], "ts", ["px"]).count() == 0


def test_round2_ops_total_on_empty(spark, empty_docs):
    from datafusion_functions_extra_spark.functions import text as TX
    from datafusion_functions_extra_spark.operators import decontaminate as DECON

    assert DECON.ngram_overlap_flags(empty_docs, empty_docs).count() == 0
    assert TX.top_ngram_stats(empty_docs, "text", "doc_id").count() == 0
    assert TX.chunk_documents(empty_docs, "text", "doc_id").count() == 0
    assert TX.tfidf_top_terms(empty_docs, "text", "doc_id").count() == 0


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(sizes=st.lists(st.integers(min_value=1, max_value=300), min_size=1, max_size=8))
def test_chunking_covers_every_token(spark, sizes):
    """Property: chunks tile the doc — total coverage with the configured
    overlap, first chunk at 0, successive offsets stride apart, and the
    concatenated non-overlapping spans reconstruct the token count."""
    from datafusion_functions_extra_spark.functions.text import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunk_documents,
    )

    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(n))) for i, n in enumerate(sizes)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, "text", "doc_id").collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, n in enumerate(sizes):
        chunks = sorted(by_doc[i], key=lambda r: r.chunk_idx)
        assert chunks[0].chunk_idx == 0
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        # every chunk but the last is full-width or the doc is short
        for c in chunks[:-1]:
            assert c.n_tokens == CHUNK_TOKENS
        # coverage: last chunk reaches the end of the doc
        last_start = (len(chunks) - 1) * CHUNK_STRIDE
        assert last_start + chunks[-1].n_tokens == n or (
            len(chunks) == 1 and chunks[0].n_tokens == min(n, CHUNK_TOKENS)
        )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    weights=st.lists(
        st.integers(min_value=1, max_value=50), min_size=2, max_size=6
    ),
    alpha=st.sampled_from([0.3, 0.5, 0.7, 1.0]),
)
def test_temperature_mixture_budget_and_bounds(spark, weights, alpha):
    """Property: rates in (0, 1]; expected kept total (sum rate*n) stays
    within the clip-explained envelope of the budget; alpha=1.0 gives
    every source the same rate."""
    rows = []
    did = 0
    for s, n in enumerate(weights):
        for _ in range(n):
            rows.append((did, f"s{s}"))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, source string")
    from datafusion_functions_extra_spark.functions.sampling import (
        temperature_mixture,
    )

    out = temperature_mixture(df, "source", "doc_id", alpha=alpha).collect()
    assert len(out) == len(weights)
    for r in out:
        assert 0.0 < r.rate <= 1.0
        assert 0 <= r.n_kept <= r.n_docs
    expected = sum(r.rate * r.n_docs for r in out)
    total = sum(weights)
    # clipping at 1 can only lower the expected total below budget*total
    assert expected <= 0.5 * total + 1e-6 * total + len(weights)
    if alpha == 1.0:
        assert {r.rate for r in out} == {0.5}


# -- round-4 operator invariants --------------------------------------------

_words = st.sampled_from(
    "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
)
_texts = st.lists(
    st.lists(_words, min_size=1, max_size=12).map(" ".join),
    min_size=1,
    max_size=10,
)


@given(_texts)
@SET
def test_duplicate_token_spans_invariants(spark, texts):
    """Spans are 1-based, well-formed, and never overlap within a doc
    (the gaps-and-islands merge is maximal: consecutive spans must be
    separated by at least one un-duplicated position)."""
    from datafusion_functions_extra_spark.operators import dedup as DD

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    rows = DD.duplicate_token_spans(df, "text", "doc_id").collect()
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        assert 1 <= r.span_start <= r.span_end
        assert r.n_tokens == r.span_end - r.span_start + 1
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for spans in by_doc.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1 + 1, f"islands {s1,e1} and {s2,e2} should merge"


@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=200))
@SET
def test_hll_merge_equals_whole(spark, vals):
    """Register merge is a true monoid: any 2-way split of the input
    merges (union + re-max) to the whole-input registers."""
    from pyspark.sql import functions as F

    from datafusion_functions_extra_spark.operators import sketches as SKCH

    cut = len(vals) // 2
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i bigint, v bigint"
    ).withColumn("g", F.lit("x"))
    whole = SKCH.hll_registers(df, "v", ["g"])
    merged = (
        SKCH.hll_registers(df.where(F.col("i") < cut), "v", ["g"])
        .unionByName(SKCH.hll_registers(df.where(F.col("i") >= cut), "v", ["g"]))
        .groupBy("g", "bucket")
        .agg(F.max("r").alias("r"))
    )
    assert {(r.bucket, r.r) for r in whole.collect()} == {
        (r.bucket, r.r) for r in merged.collect()
    }


@given(_texts)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_leakage_split_is_component_consistent(spark, texts):
    from datafusion_functions_extra_spark.operators import similarity as SIM

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    rows = SIM.leakage_safe_split(df, "text", "doc_id", threshold=0.4).collect()
    assert len(rows) == len(texts)
    comp_split: dict[int, str] = {}
    for r in rows:
        assert comp_split.setdefault(r.component, r.split) == r.split


# ---------------------------------------------------------------------------
# round-4 operators: skyline dominance, BM25 scoring — property checks on
# arbitrary inputs (the suite queries pin fixed corpora; these pin the math)
# ---------------------------------------------------------------------------

point_lists = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=1,
    max_size=25,
)


@given(pts=point_lists)
@SET
def test_pareto_sweep_equals_dominance_definition(spark, pts):
    """The sort-sweep window identity must equal the NOT-EXISTS dominance
    definition on arbitrary (price, size) multisets (duplicates, ties,
    collinear points included)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(float(p), s) for p, s in pts], "price double, sz int"
    ).distinct()
    w = Window.orderBy(F.col("price").asc(), F.col("sz").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    got = {
        (r.price, r.sz)
        for r in df.withColumn("best", F.min("sz").over(w))
        .where(F.col("best").isNull() | (F.col("sz") < F.col("best")))
        .collect()
    }
    uniq = {(float(p), s) for p, s in pts}
    expected = {
        a
        for a in uniq
        if not any(
            q[0] <= a[0] and q[1] <= a[1] and q != a for q in uniq
        )
    }
    assert got == expected


docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon"]),
        min_size=1,
        max_size=8,
    ),
    min_size=1,
    max_size=8,
)


@given(docs=docs_strategy)
@SET
def test_bm25_matches_reference_formula(spark, docs):
    """bm25_topk must reproduce the closed-form Okapi formula on arbitrary
    tiny corpora (all docs returned: k = corpus size)."""
    import math as m

    from datafusion_functions_extra_spark.functions.text import bm25_topk

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.score
        for r in bm25_topk(
            df, "text", "doc_id", [("q", ["alpha", "beta"])], k=len(docs)
        ).collect()
    }
    N = len(docs)
    avgdl = sum(len(t) for t in docs) / N
    df_counts = {
        t: sum(1 for d in docs if t in d) for t in ("alpha", "beta")
    }
    for i, toks in enumerate(docs):
        score = 0.0
        for t in ("alpha", "beta"):
            tf = toks.count(t)
            if not tf:
                continue
            idf = m.log(1 + (N - df_counts[t] + 0.5) / (df_counts[t] + 0.5))
            score += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
        if score > 0:
            assert out[i] == pytest.approx(round(score, 6), abs=2e-6)
        else:
            assert i not in out  # no zero-score rows: index probe, not scan


# ---------------------------------------------------------------------------
# round-5b additions: water-filling, interval overlap, rolling median
# ---------------------------------------------------------------------------


def _unimax_py(caps: dict, num: int, den: int) -> dict:
    """Reference water-filling: exact fixpoint by bisection-free scan."""
    budget = sum(caps.values()) * num // den
    items = sorted(caps.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(items)
    alloc = {}
    committed = 0
    for i, (k, c) in enumerate(items):
        remaining_keys = n - i
        if c * remaining_keys + committed <= budget:
            alloc[k] = float(c)
            committed += c
        else:
            level = (budget - committed) / remaining_keys
            for k2, _ in items[i:]:
                alloc[k2] = level
            break
    return alloc


@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d", "e", "f"]),
        st.integers(1, 10_000),
        min_size=1,
        max_size=6,
    ),
    st.integers(1, 10),
)
@SET
def test_unimax_matches_reference_waterfill(spark, caps, num_tenths):
    from datafusion_functions_extra_spark.functions.sampling import (
        unimax_allocation,
    )

    df = spark.createDataFrame(
        list(caps.items()), "lang string, cap_tokens bigint"
    )
    got = {
        r.lang: r.alloc_tokens
        for r in unimax_allocation(
            df, "lang", "cap_tokens", num_tenths, 10
        ).collect()
    }
    want = _unimax_py(caps, num_tenths, 10)
    assert set(got) == set(want)
    for k in want:
        # Spark side rounds to 6 dp (r6n); compare at that granularity
        assert math.isclose(got[k], want[k], rel_tol=1e-9, abs_tol=2e-6)
    # allocations never exceed caps, and the total never exceeds budget
    assert all(got[k] <= caps[k] + 1e-6 for k in got)
    assert sum(got.values()) <= sum(caps.values()) * num_tenths / 10 + 1e-4


@given(
    st.lists(
        st.tuples(st.integers(0, 400), st.integers(0, 120)),
        min_size=0,
        max_size=12,
    ),
    st.lists(
        st.tuples(st.integers(0, 400), st.integers(0, 120)),
        min_size=0,
        max_size=12,
    ),
)
@SET
def test_interval_overlap_matches_bruteforce(spark, lraw, rraw):
    import datetime as dt

    from datafusion_functions_extra_spark.operators.ranges import (
        interval_overlap_join,
    )

    t0 = dt.datetime(2024, 1, 1)

    def mk(raw):
        return [
            (i, t0 + dt.timedelta(minutes=s), t0 + dt.timedelta(minutes=s + d))
            for i, (s, d) in enumerate(raw)
        ]

    lrows, rrows = mk(lraw), mk(rraw)
    left = spark.createDataFrame(
        lrows or [(0, t0, t0)], "lid bigint, ls timestamp, le timestamp"
    )
    right = spark.createDataFrame(
        rrows or [(0, t0, t0)], "rid bigint, rs timestamp, re timestamp"
    )
    if not lrows:
        left = left.where("1=0")
    if not rrows:
        right = right.where("1=0")
    got = {
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, [], "ls", "le", "rs", "re", bin_seconds=1800
        ).collect()
    }
    want = {
        (li, ri)
        for li, ls, le in lrows
        for ri, rs, re in rrows
        if ls <= re and rs <= le
    }
    assert got == want


@given(st.lists(st.integers(0, 1000), min_size=1, max_size=30))
@SET
def test_rolling_median_frame_convention(spark, revs):
    """The suite's in-row sorted-frame pick must equal the python lower
    median of the trailing <=7-element window."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (t0 + dt.timedelta(days=i), float(v)) for i, v in enumerate(revs)
    ]
    df = spark.createDataFrame(rows, "day timestamp, rev double")
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    fr = F.array_sort(F.collect_list("rev").over(w))
    got = {
        r.day: r.m
        for r in df.select(
            "day",
            F.element_at(
                fr, (F.floor((F.size(fr) - 1) / 2) + 1).cast("int")
            ).alias("m"),
        ).collect()
    }
    for i in range(len(revs)):
        frame = sorted(revs[max(0, i - 6) : i + 1])
        want = float(frame[(len(frame) - 1) // 2])
        assert got[rows[i][0]] == want
