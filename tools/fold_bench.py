"""Fold fresh bench runs into BENCH_local_r4.json per-query medians.

Usage: python tools/fold_bench.py run13.json run14.json [...]

Existing queries keep their recorded medians (medians of up to 8 dedicated
runs from earlier in the round — re-folding a couple of new runs into an
8-run median barely moves it and would silently re-baseline); queries NEW
to the medians file take the median of the supplied runs.  The suite total
becomes the sum of per-query medians and the note records provenance.
"""

from __future__ import annotations

import json
import statistics
import sys

MEDIANS = "BENCH_local_r4.json"


def main() -> int:
    runs = [json.load(open(p)) for p in sys.argv[1:]]
    assert runs, "pass at least one bench run json"
    med = json.load(open(MEDIANS))
    known = med["queries"]
    new_names = sorted(
        {q for r in runs for q in r["queries"]} - set(known)
    )
    for q in new_names:
        vals = [r["queries"][q] for r in runs if q in r["queries"]]
        known[q] = round(statistics.median(vals), 4)
    med["queries"] = dict(sorted(known.items()))
    med["value"] = round(sum(known.values()), 4)
    med["note"] = (
        med["note"].split(";")[0]
        + f"; {len(new_names)} round-4c additions use the median of "
        f"{len(runs)} dedicated runs (13-15), 165 queries total"
    )
    json.dump(med, open(MEDIANS, "w"))
    print(f"folded {len(new_names)} new queries; total {med['value']}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
