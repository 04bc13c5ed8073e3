"""Sessionize-stream deep scale probe (VERDICT r6 ask #6).

`events_sessionize_stream` carried the worst streaming exponent in the
round-6 curve (α=+0.22 on the 0.01→0.1 decade — session-window state
merges). This probe extends the curve past the largest driver scale
factor by synthesizing sf0.2 / sf0.4-equivalent event tables — the
sf0.1 events unioned with user-id-shifted copies (disjoint user spaces,
so sessions replicate exactly and the state-store row count scales with
the input by construction, no cross-copy merge artifacts) — and times
the SAME registry callable on each, also recording input rows vs output
sessions (≈ state rows): if per-row cost flattens as the fixed
planning/state-store setup amortizes, the +0.22 was overhead, not a
super-linear state term.

Usage: python tools/sessionize_state_probe.py
Writes a markdown table to stdout (paste into SCALE.md §12.5).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
from text_sentiment_classification_hadoop_spark_spark.session import get_spark  # noqa: E402
from text_sentiment_classification_hadoop_spark_spark.sources.tables import load_table  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
SCRATCH = "/tmp/spark_graft_scale"
USER_SHIFT = 10_000_000  # clears the events user_id domain


def synth_dir(spark, mult: int) -> str:
    """events @ sf0.1 × ``mult`` with disjoint user-id spaces."""
    import glob as globmod
    import shutil

    from pyspark.sql import functions as F
    out = os.path.join(SCRATCH, f"sf0.{mult}x")
    path = os.path.join(out, "events.parquet")
    if not os.path.isfile(path):
        e = load_table(spark, "events", BASE_SF)
        parts = [e.withColumn(
            "user_id",
            (F.col("user_id") + F.lit(i * USER_SHIFT)).cast(
                dict(e.dtypes)["user_id"]))
            for i in range(mult)]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        # the file-stream source globs for a FILE named events.parquet
        # (the driver testdata layout) — emit one plain file, not a dir
        tmp = os.path.join(out, "_tmp_events")
        u.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(path, ignore_errors=True)
        part = globmod.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.replace(part, path)
        shutil.rmtree(tmp)
    return out


def main() -> None:
    spark = get_spark(app_name="sessionize_probe")
    fn = entry.queries()["events_sessionize_stream"]
    rows = []
    for label, sf_dir, mult in [("sf0.1", BASE_SF, 1),
                                ("sf0.2eq", None, 2),
                                ("sf0.4eq", None, 4)]:
        if sf_dir is None:
            sf_dir = synth_dir(spark, mult)
        n_in = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        # median of 3 (the bench's instrument discipline)
        times = []
        n_sessions = 0
        for _ in range(3):
            t0 = time.monotonic()
            n_sessions = fn(spark, sf_dir).count()
            times.append(time.monotonic() - t0)
        t = sorted(times)[1]
        rows.append((label, n_in, n_sessions, t))
    print("| input | events | sessions (state rows) | t (median/3) | "
          "us/event | α vs prev |")
    print("|---|---|---|---|---|---|")
    prev = None
    for label, n_in, n_sess, t in rows:
        alpha = ""
        if prev:
            alpha = f"{math.log(t / prev[3]) / math.log(n_in / prev[1]):+.2f}"
        print(f"| {label} | {n_in} | {n_sess} | {t:.2f}s | "
              f"{t / n_in * 1e6:.1f} | {alpha} |")
        prev = (label, n_in, n_sess, t)
    spark.stop()


if __name__ == "__main__":
    main()
