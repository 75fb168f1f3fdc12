"""r12: measure the auto_dedup_partitions counting pre-pass on the 10M
corpora and record its decisions (r11 verdict #3 — the auto-sizer must
choose correctly on the very corpora the scaling rung measures).

Expected: the 64-file archive layout (156k pages/task < 300k threshold)
keeps the default partial-then-final plan (None); the 8-file fat layout
(1.25M pages/task) engages the pre-exchange sized
ceil(10M x 12 links/page / 2M rows per reduce task) = 60, floored at
default parallelism. prepass_sec is the decompress-only counting job's
wall — compare the ~200 s full extract at this rung (the pre-pass is
the documented ~5-10% overhead, paid only when inputs might be fat).

Writes /tmp/prepass_probe.json (merged into EXTRACT_SCALING_10M.json by
merge_split64.py).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from globallinks_spark.session import get_spark
from globallinks_spark.operators.extract import auto_dedup_partitions
import bench_extract as BE


def main() -> None:
    spark = get_spark(app_name="prepass_probe")
    out = {}
    for nf in (64, 8):
        work = f"/tmp/watcache/n10000000_f{nf}"
        paths = BE.ensure_corpus(10_000_000, nf, work)
        # warm one tiny pass so codegen isn't in the timed number
        auto_dedup_partitions(spark, paths[:1])
        t0 = time.perf_counter()
        d = auto_dedup_partitions(spark, paths)
        sec = round(time.perf_counter() - t0, 2)
        out[f"files_{nf}"] = {"n_files": nf, "decision": d,
                              "prepass_sec": sec}
        print(nf, d, sec, flush=True)
    out["note"] = (
        "auto_dedup_partitions on the 10M-page corpus: the 64-file "
        "archive layout (156k pages/task < 300k threshold) keeps the "
        "default partial-then-final plan (None); the 8-file fat layout "
        "(1.25M pages/task) engages the pre-exchange sized "
        "ceil(10M x 12 / 2M) = 60 reduce tasks. prepass_sec is the "
        "decompress-only counting job's wall time - compare "
        "extract_sec ~200s at this rung."
    )
    json.dump(out, open("/tmp/prepass_probe.json", "w"), indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
