"""Fold fresh bench runs into the recorded per-query medians file.

Usage: python tools/fold_bench.py [--medians FILE] run_a.json run_b.json [...]

Existing queries keep their recorded medians (medians of several dedicated
runs from earlier in the round — re-folding a couple of new runs into an
established median barely moves it and would silently re-baseline);
queries NEW to the medians file take the median of the supplied runs.  The
suite total becomes the sum of per-query medians, and the provenance note
APPENDS a line derived from the actual inputs (run filenames, counts) —
never hardcoded text, and never truncating the hand-maintained note.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--medians", default="BENCH_local_r5.json")
    ap.add_argument(
        "--re-median",
        default="",
        help="comma-separated EXISTING query names whose recorded median "
        "is replaced by the median of the supplied runs — only for "
        "queries whose PLAN changed (or whose recorded number was shown "
        "not to reproduce); the provenance note names them so a "
        "re-baseline is never silent",
    )
    ap.add_argument("runs", nargs="+")
    args = ap.parse_args()

    runs = [json.load(open(p)) for p in args.runs]
    med = json.load(open(args.medians))
    known = med["queries"]
    re_medianed = sorted(n for n in args.re_median.split(",") if n)
    # every re-median name must have a fresh measurement in at least one
    # supplied run — otherwise the pop would silently DELETE the query
    # from the baseline (typo, or the query wasn't re-timed) while the
    # provenance note claims it was re-medianed
    supplied = {q for r in runs for q in r["queries"]}
    missing = [q for q in re_medianed if q not in supplied]
    if missing:
        raise SystemExit(
            f"--re-median names absent from every supplied run: {missing}"
        )
    for q in re_medianed:
        known.pop(q, None)
    new_names = sorted({q for r in runs for q in r["queries"]} - set(known))
    for q in new_names:
        vals = [r["queries"][q] for r in runs if q in r["queries"]]
        known[q] = round(statistics.median(vals), 4)
    med["queries"] = dict(sorted(known.items()))
    med["value"] = round(sum(known.values()), 4)
    labels = ", ".join(os.path.basename(p) for p in args.runs)
    med["note"] = (
        med.get("note", "")
        + f"; {len(new_names)} additions take the median of {len(runs)} "
        f"supplied runs ({labels}); {len(known)} queries total"
        + (
            f"; re-medianed (plan change or non-reproducing recorded median): {', '.join(re_medianed)}"
            if re_medianed
            else ""
        )
    )
    json.dump(med, open(args.medians, "w"))
    print(f"folded {len(new_names)} new queries; total {med['value']}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
