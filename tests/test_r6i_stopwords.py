"""Round-6i: corpus-adaptive stopword discovery — Python replica."""

import re
from collections import defaultdict

import pandas as pd


def test_stopword_discovery_matches_python(spark):
    sf = "/root/testdata/sf0.001"
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        r.term: (r.df, r.n_sources, r.df_ratio)
        for r in QUERIES["text_stopword_discovery"](spark, sf).collect()
    }

    docs = pd.read_parquet(f"{sf}/documents.parquet")
    nd = len(docs)
    all_sources = set(docs["source"])
    df = defaultdict(set)
    srcs = defaultdict(set)
    for r in docs.itertuples(index=False):
        toks = set(re.sub(r"\s+", " ", r.text).strip().lower().split(" "))
        for t in toks:
            df[t].add(int(r.doc_id))
            srcs[t].add(r.source)
    cands = [
        t
        for t in df
        if len(df[t]) * 2 >= nd and srcs[t] == all_sources
    ]
    top = sorted(cands, key=lambda t: (-len(df[t]), t))[:32]
    want = {
        t: (len(df[t]), len(all_sources), round(len(df[t]) / nd + 1e-9, 6))
        for t in top
    }
    assert got == want
    # the discovered list is genuinely stopword-shaped: every candidate
    # covers at least half the corpus
    assert all(v[0] * 2 >= nd for v in want.values())
    assert want, "fixture corpus should surface function words"
