"""Round-5t: streaming windowFunnel stateful operator — parity with the
batch query across micro-batch boundaries."""

import os
from collections import Counter

import pandas as pd
import pytest


def test_streaming_window_funnel_matches_batch(spark, tmp_path):
    from datafusion_functions_extra_spark.streaming.events import (
        run_available_now,
        streaming_window_funnel,
    )
    from datafusion_functions_extra_spark.suite import (
        _FUNNEL_W_US,
        QUERIES,
    )

    sf = "/root/testdata/sf0.001"
    ev = pd.read_parquet(f"{sf}/events.parquet").sort_values("ts")
    src = str(tmp_path / "src")
    os.makedirs(src)
    cuts = [len(ev) // 3, 2 * len(ev) // 3, len(ev)]
    lo, t0 = 0, 1_000_000.0
    for i, hi in enumerate(cuts):
        p = os.path.join(src, f"b{i}.parquet")
        ev.iloc[lo:hi].to_parquet(
            p, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        os.utime(p, (t0 + i, t0 + i))
        lo = hi
    sdf = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = run_available_now(
        streaming_window_funnel(sdf, window_us=_FUNNEL_W_US),
        output_mode="update",
    ).collect()

    # latest emit per user wins (levels are monotone, so max == last)
    final = {}
    for r in out:
        final[r.user_id] = max(final.get(r.user_id, 0), r.level)

    # every user with events must have emitted at least once
    assert set(final) == set(int(u) for u in ev["user_id"].unique())

    # histogram parity with the batch query (>= level counts)
    batch = {
        r.level: r.n_users
        for r in QUERIES["events_window_funnel"](spark, sf).collect()
    }
    got = Counter(final.values())
    for lvl in (1, 2, 3):
        assert sum(c for l_, c in got.items() if l_ >= lvl) == batch[lvl]

    # per-user parity with a Python replica of the batch fold
    evs = ev.sort_values(["user_id", "ts", "event_id"])
    evs["us"] = evs["ts"].astype("datetime64[us]").astype("int64")
    for uid, g in evs.groupby("user_id"):
        anchor = best = None
        lvl = 0
        for _, row in g.iterrows():
            t, us = row["event_type"], int(row["us"])
            if (
                t == "click"
                and anchor is not None
                and us - anchor <= _FUNNEL_W_US
            ):
                lvl = max(lvl, 2)
                best = anchor if best is None else max(best, anchor)
            if (
                t == "purchase"
                and best is not None
                and us - best <= _FUNNEL_W_US
            ):
                lvl = max(lvl, 3)
            if t == "view":
                lvl = max(lvl, 1)
                anchor = us if anchor is None else max(anchor, us)
        assert final[int(uid)] == lvl, uid
