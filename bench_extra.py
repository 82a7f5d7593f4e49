"""Per-query isolation harness (guide §1.1/§1.4): noop-sink timing and
``explain("formatted")`` plan dumps for any subset of the bench queries.

``bench.py`` is the frozen driver-facing harness; this file exists so
optimization work can time one query at a time (warmup + reps, min/median)
and capture the physical plan before/after a change without touching the
frozen file.

Usage:
  python bench_extra.py time    [--sf DIR] [--reps N] [q ...]
  python bench_extra.py explain [--sf DIR] --out plans/r06 --suffix before [q ...]

With no query names, runs every query in bench.HEADLINE.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE, run_noop  # noqa: E402
from inferdf_rs_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["time", "explain"])
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="plans/r06")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("queries", nargs="*")
    args, extra = ap.parse_known_args()
    args.queries = args.queries + extra

    table = dict(HEADLINE)
    names = args.queries or [n for n, _ in HEADLINE]
    if any(n not in table for n in names):
        import __spark_entry__ as entrymod

        for n, fn in entrymod.queries().items():
            table.setdefault(n, fn)
    spark = get_spark(app_name="inferdf_bench_extra")

    if args.mode == "explain":
        os.makedirs(args.out, exist_ok=True)
        for name in names:
            df = table[name](spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {path}")
        spark.stop()
        return

    per, spread = {}, {}
    for name in names:
        fn = table[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        run_noop(fn(spark, args.sf))  # warmup, untimed
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run_noop(fn(spark, args.sf))
            times.append(time.perf_counter() - t0)
        per[name] = round(statistics.median(times), 3)
        spread[name] = [round(min(times), 3), round(max(times), 3)]
        print(f"{name}: median={per[name]} spread={spread[name]}", flush=True)
    print(json.dumps({"sf": args.sf, "queries": per, "spread": spread, "total": round(sum(per.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
