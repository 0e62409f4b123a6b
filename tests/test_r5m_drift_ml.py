"""Round-5m operators: vocabulary richness, DP noisy counts, target
encoding, PSI drift, Brier/ECE calibration scoring, event JSD."""

import hashlib
import math
import re

import numpy as np
import pytest


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _tokens(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text).strip().lower().split(" ")


def _quality(text: str) -> float:
    from datafusion_functions_extra_spark.functions.text import STOPWORDS

    norm = re.sub(r"\s+", " ", text).strip().lower()
    toks = norm.split(" ")
    stop = sum(1 for t in toks if t in STOPWORDS) / len(toks)
    q = (
        0.3 * min(1.0, len(norm) / 500.0)
        + 0.4 * (len(set(toks)) / len(toks))
        + 0.3 * (1.0 - min(1.0, abs(stop - 0.4) / 0.6))
    )
    return round(q + 1e-9, 6)


def test_vocab_richness_matches_pandas(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = QUERIES["corpus_vocab_richness"](spark, sf).collect()[0]
    pdf = spark.read.parquet(f"{sf}/documents.parquet").toPandas()
    counts = {}
    for text in pdf["text"]:
        for t in _tokens(text):
            counts[t] = counts.get(t, 0) + 1
    n = sum(counts.values())
    d = len(counts)
    f1 = sum(1 for c in counts.values() if c == 1)
    f2 = sum(1 for c in counts.values() if c == 2)
    assert (got.n_tokens, got.vocab_size, got.f1, got.f2) == (n, d, f1, f2)
    assert got.chao1 == pytest.approx(
        d + f1 * (f1 - 1) / (2.0 * (f2 + 1)), abs=2e-6
    )
    assert got.gt_unseen_mass == pytest.approx(f1 / n, abs=2e-6)
    assert got.gt_coverage == pytest.approx(1 - f1 / n, abs=2e-6)
    assert got.chao1 >= got.vocab_size  # estimator never below observed


def test_dp_noisy_counts_deterministic_laplace(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    rows = QUERIES["docs_dp_noisy_counts"](spark, sf).collect()
    pdf = spark.read.parquet(f"{sf}/documents.parquet").toPandas()
    true = pdf.groupby("source").size().to_dict()
    assert len(rows) == 3 * len(true)
    for r in rows:
        assert r.true_n == true[r.source]
        # DuckDB eps::VARCHAR of 0.5 is "0.5"; float formatting matches
        eps_str = (
            f"{r.epsilon:.1f}" if r.epsilon != int(r.epsilon) else str(r.epsilon)
        )
        u = _hash60(f"{r.source}:{eps_str}") / float(1 << 60)
        noise = (
            -(1.0 / r.epsilon)
            * math.copysign(1.0, u - 0.5)
            * math.log(1.0 - 2.0 * abs(u - 0.5))
        )
        assert r.noisy_count == pytest.approx(r.true_n + noise, abs=2e-6)
        assert r.abs_err == pytest.approx(abs(noise), abs=2e-6)
    # lower epsilon => more noise, on average across sources
    by_eps = {}
    for r in rows:
        by_eps.setdefault(r.epsilon, []).append(r.abs_err)
    means = {e: np.mean(v) for e, v in by_eps.items()}
    assert means[0.1] > means[0.5] > means[2.0]


def test_target_encoding_is_leakage_free(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        (r.segment, r.fold): r
        for r in QUERIES["segment_target_encoding"](spark, sf).collect()
    }
    o = spark.read.parquet(f"{sf}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{sf}/customer.parquet").toPandas()
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df["fold"] = [_hash60(str(k)) % 5 for k in df["o_orderkey"]]
    df["cents"] = (df["o_totalprice"] * 100).round().astype("int64")
    n_tot, s_tot = len(df), int(df["cents"].sum())
    for (seg, fold), r in got.items():
        seg_df = df[df["c_mktsegment"] == seg]
        infold = seg_df[seg_df["fold"] == fold]
        oof = seg_df[seg_df["fold"] != fold]
        assert r.n_rows == len(infold)
        want_oof = oof["cents"].sum() / len(oof) / 100.0
        assert r.oof_mean == pytest.approx(want_oof, abs=2e-6)
        glob = df[df["fold"] != fold]
        prior = glob["cents"].sum() / len(glob)
        smoothed = (
            (oof["cents"].sum() + 100.0 * prior) / (len(oof) + 100.0) / 100.0
        )
        assert r.smoothed_mean == pytest.approx(smoothed, abs=2e-6)
        # leakage check: perturbing the fold's own rows cannot change
        # its encoding — verified structurally: only out-of-fold sums
        # enter want_oof / smoothed above, and they matched


def test_psi_matches_pandas_and_nonnegative(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        r.source: r.psi
        for r in QUERIES["source_quality_psi"](spark, sf).collect()
    }
    pdf = spark.read.parquet(f"{sf}/documents.parquet").toPandas()
    pdf["score"] = [_quality(t) for t in pdf["text"]]
    n = len(pdf)
    scores = np.sort(pdf["score"].to_numpy())
    cuts = [
        scores[math.ceil(d * n / 10.0) - 1] for d in range(1, 10)
    ]
    def bin_of(s):
        return 1 + sum(1 for c in cuts if s > c)
    pdf["bin"] = [bin_of(s) for s in pdf["score"]]
    pooled = pdf.groupby("bin").size().to_dict()
    for src, grp in pdf.groupby("source"):
        ns = len(grp)
        sb = grp.groupby("bin").size().to_dict()
        psi = 0
        for b in pooled:
            cb, cp = sb.get(b, 0), pooled[b]
            p = (cb + 1.0) / (ns + 10.0)
            q = (cp + 1.0) / (n + 10.0)
            psi += round((p - q) * math.log(p / q) * 1e6 + 1e-3)
        assert got[src] == pytest.approx(psi / 1e6, abs=2e-6)
        assert got[src] >= 0.0


def test_brier_ece_matches_pandas(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = QUERIES["quality_brier_ece"](spark, sf).collect()[0]
    pdf = spark.read.parquet(f"{sf}/documents.parquet").toPandas()
    pdf["q"] = [_quality(t) for t in pdf["text"]]
    dup = pdf.groupby("text")["doc_id"].transform("size") > 1
    pdf["y"] = dup.astype(int)
    pdf["bin"] = np.minimum(9, np.floor(pdf["q"] * 10)).astype(int)
    pdf["part"] = [_hash60(str(i)) % 2 for i in pdf["doc_id"]]
    tr = pdf[pdf["part"] == 0]
    te = pdf[pdf["part"] == 1]
    p0 = round(tr["y"].sum() / len(tr) + math.copysign(1e-9, tr["y"].sum() or 1), 6)
    pb = {
        b: round(g["y"].sum() / len(g) + (1e-9 if g["y"].sum() else 1e-9), 6)
        for b, g in tr.groupby("bin")
    }
    assert got.n_test == len(te)
    te = te.copy()
    te["p"] = [pb.get(b, p0) for b in te["bin"]]
    cells = te.groupby(["bin", "y", "p"]).size()
    bsum = sum(round((p - y) ** 2 * 1e12) * c for (_, y, p), c in cells.items())
    b0sum = sum(round((p0 - y) ** 2 * 1e12) * c for (_, y, _), c in cells.items())
    assert got.brier == pytest.approx(bsum / 1e12 / len(te), abs=2e-6)
    assert got.brier_base == pytest.approx(b0sum / 1e12 / len(te), abs=2e-6)
    eb = te.groupby(["bin", "p"])
    esum = sum(
        round(abs(g["y"].sum() / len(g) - p) * 1e12) * len(g)
        for (b, p), g in eb
    )
    assert got.ece == pytest.approx(esum / 1e12 / len(te), abs=2e-6)
    assert 0.0 <= got.brier <= 1.0 and 0.0 <= got.ece <= 1.0


def test_jsd_matches_pandas_and_bounded(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        (r.type_a, r.type_b): r
        for r in QUERIES["event_type_value_jsd"](spark, sf).collect()
    }
    pdf = spark.read.parquet(f"{sf}/events.parquet").toPandas()
    pdf["bin"] = np.minimum(
        15, (pdf["value"] * 100).round().astype("int64") // 4096
    )
    types = sorted(pdf["event_type"].unique())
    assert len(got) == len(types) * (len(types) - 1) // 2
    hist = {
        t: pdf[pdf["event_type"] == t].groupby("bin").size().to_dict()
        for t in types
    }
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            na = sum(hist[ta].values())
            nb = sum(hist[tb].values())
            sp = sq = 0
            for b in range(16):
                ca, cb = hist[ta].get(b, 0), hist[tb].get(b, 0)
                if ca > 0:
                    sp += round(
                        (ca / na)
                        * math.log(2.0 * ca * nb / (ca * nb + cb * na))
                        * 1e6
                        + 1e-3
                    )
                if cb > 0:
                    sq += round(
                        (cb / nb)
                        * math.log(2.0 * cb * na / (cb * na + ca * nb))
                        * 1e6
                        + 1e-3
                    )
            want = (sp + sq) / 2e6
            r = got[(ta, tb)]
            assert r.jsd_nats == pytest.approx(want, abs=2e-6)
            assert -1e-9 <= r.jsd_nats <= math.log(2.0) + 1e-9
            assert r.jsd_normalized == pytest.approx(
                want / math.log(2.0), abs=2e-6
            )
