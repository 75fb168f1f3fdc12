"""bucketed_interval_join / prior_event_stats: the bucketized range
join must match the naive interval predicate exactly — boundary
exclusivity, cross-bucket windows, empty windows, bucket-width
invariance."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from globallinks_spark.operators.rangejoin import (
    bucketed_interval_join,
    prior_event_stats,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def events(spark, offsets_sec, values=None):
    values = values or [1.0] * len(offsets_sec)
    rows = [
        (i, T0 + dt.timedelta(seconds=s), float(v))
        for i, (s, v) in enumerate(zip(offsets_sec, values))
    ]
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, value double"
    )


class TestPriorEventStats:
    def test_counts_match_naive(self, spark):
        # events at 0, 100, 550, 700, 1500 s; lookback 600 s
        ev = events(spark, [0, 100, 550, 700, 1500], [1, 2, 3, 4, 5])
        got = {r.event_id: r for r in prior_event_stats(ev, 600).collect()}
        assert got[0].n_prior == 0 and got[0].prior_value == 0.0
        assert got[1].n_prior == 1          # event 0
        assert got[2].n_prior == 2          # events 0, 100
        # window (100, 700) EXCLUSIVE: 550 only — 100 is exactly 600s back
        assert got[3].n_prior == 1
        assert got[3].prior_value == 3.0
        assert got[4].n_prior == 0          # everything >600s back
        assert len(got) == 5                # empty windows kept

    def test_window_is_exclusive_both_ends(self, spark):
        # exactly lookback seconds back → excluded; same ts → excluded
        ev = events(spark, [0, 600, 600])
        got = {r.event_id: r.n_prior
               for r in prior_event_stats(ev, 600).collect()}
        assert got[1] == 0 and got[2] == 0

    def test_bucket_width_invariance(self, spark):
        ev = events(spark, [0, 55, 119, 120, 200, 599, 601, 1200])
        a = sorted(
            (r.event_id, r.n_prior)
            for r in prior_event_stats(ev, 600).collect()
        )
        l = ev.select("event_id", F.col("ts").alias("l_ts"))
        r = ev.select(F.col("ts").alias("r_ts"))
        for bucket in (60, 250, 600):
            j = bucketed_interval_join(l, r, "l_ts", "r_ts", 600, bucket)
            b = sorted(
                (row.event_id, row.n)
                for row in j.groupBy("event_id")
                .agg(F.count("*").alias("n"))
                .collect()
            )
            with_zeros = dict(b)
            full = sorted(
                (i, with_zeros.get(i, 0)) for i, _ in a
            )
            assert full == a, f"bucket={bucket}"

    def test_matches_naive_join_random(self, spark):
        import random

        rng = random.Random(7)
        offs = sorted(rng.sample(range(0, 5000), 60))
        ev = events(spark, offs)
        got = {r.event_id: r.n_prior
               for r in prior_event_stats(ev, 600).collect()}
        naive = {
            i: sum(1 for o2 in offs if o - 600 < o2 < o)
            for i, o in enumerate(offs)
        }
        assert got == naive
