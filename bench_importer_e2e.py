"""Importer end-to-end at the reference's unit of work: one full-size
synthetic WAT segment (>=150k pages) through the complete

    importer -> compact -> store -> query

pipeline (runner.run_import / run_compact / run_store / query_links),
recording per-stage wall seconds to IMPORTER_E2E.json.

Why this exists: the reference's sizing unit is "~30 s per WAT file per
core" for a ~100-200k-page WAT (cmd/importer/main.go:332; SURVEY.md
section 6 derives "one ~420 MB WAT in ~30-60 s/task" for the Spark
rebuild). bench_extract.py measures the extract+compact kernels at
100k pages; this script proves the FULL pipeline - including the
parquet sinks, the serving-table bucketed write with manifest, and a
pruned API query - stays inside the derived per-stage budget at
n_pages >= 150k, and emits the artifact the claim cites.

Layout mirrors production: the segment is n_files gzip WAT files (gzip
is unsplittable, so Spark schedules one task per file - the
goroutine-per-file model, main.go:272-291). Stage times are wall
seconds on local[cores]; `core_sec_per_150k_pages` normalizes
(import+compact) to the reference's unit for a direct comparison.

Usage: python bench_importer_e2e.py [n_pages] [cores] [out_json]
"""

from __future__ import annotations

import gzip
import json
import os
import shutil
import sys
import tempfile
import time

from bench_extract import _page
from globallinks_spark.operators.linkdb import LinkQuery
from globallinks_spark.runner import (
    query_links,
    run_compact,
    run_import,
    run_store,
)
from globallinks_spark.session import get_spark


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 160_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out_json = sys.argv[3] if len(sys.argv) > 3 else "IMPORTER_E2E.json"

    spark = get_spark(
        app_name="importer_e2e", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )

    work = tempfile.mkdtemp(prefix="importer_e2e-")
    wat_dir = os.path.join(work, "wat")
    data_dir = os.path.join(work, "data")
    serving = os.path.join(work, "serving")
    os.makedirs(wat_dir)
    try:
        # --- generate: one segment of n_files WATs (not a pipeline stage)
        n_files = max(cores, 1)
        per_file = n_pages // n_files
        t0 = time.perf_counter()
        for f in range(n_files):
            path = os.path.join(wat_dir, f"e2e-{f:05d}.warc.wat.gz")
            with gzip.open(path, "wt", encoding="utf-8") as out:
                for i in range(f * per_file, (f + 1) * per_file):
                    out.write("WARC-Type: metadata\n")
                    out.write(json.dumps(_page(i)) + "\n")
        gen_sec = time.perf_counter() - t0
        wat_bytes = sum(
            os.path.getsize(os.path.join(wat_dir, p))
            for p in os.listdir(wat_dir)
        )
        paths = sorted(
            os.path.join(wat_dir, p) for p in os.listdir(wat_dir)
        )

        # warm codegen on a 2-file slice so stage times are the
        # sustained-regime numbers both claims cite (the reference's
        # ~30 s/WAT is logged mid-run, equally steady-state)
        warm_dir = os.path.join(work, "warm")
        run_import(spark, paths[:2], warm_dir, "warm")
        run_compact(spark, warm_dir, "warm")
        shutil.rmtree(warm_dir, ignore_errors=True)

        seg = "1754769600.0"
        stages: dict[str, float] = {}

        t0 = time.perf_counter()
        run_import(spark, paths, data_dir, seg)
        stages["import_sec"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        run_compact(spark, data_dir, seg)
        stages["compact_sec"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        run_store(spark, data_dir, serving)
        stages["store_sec"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        page = query_links(
            spark, serving, LinkQuery(domain="target42.org", limit=100),
        ).collect()
        stages["query_sec"] = round(time.perf_counter() - t0, 2)

        links_rows = spark.read.parquet(
            os.path.join(data_dir, "links", f"segment={seg}")
        ).count()
        compact_rows = spark.read.parquet(
            os.path.join(data_dir, "compact", f"segment={seg}")
        ).count()

        pipeline_sec = stages["import_sec"] + stages["compact_sec"]
        result = {
            "metric": "importer_e2e_per_stage_sec",
            "n_pages": n_pages,
            "n_wat_files": n_files,
            "wat_gz_mb": round(wat_bytes / 1e6, 1),
            "cores": cores,
            **stages,
            "gen_sec": round(gen_sec, 2),
            "links_rows": links_rows,
            "compact_rows": compact_rows,
            "query_rows": len(page),
            # reference unit: ~30 s per ~100-200k-page WAT per core
            # (cmd/importer/main.go:332). import+compact is the work that
            # unit covers; normalize to core-seconds per 150k pages.
            "core_sec_per_150k_pages": round(
                pipeline_sec * cores * (150_000 / n_pages), 1
            ),
            "import_pages_per_min_per_core": round(
                n_pages / (stages["import_sec"] / 60) / cores
            ),
            "reference_unit": "~30 s per WAT file per core "
                              "(cmd/importer/main.go:332)",
            # what each side's unit covers, so the numbers compare
            # honestly: the reference's ~30 s/WAT parses and appends to
            # per-file text buffers (one pass, one sink); import_sec here
            # materializes every output column, globally deduplicates
            # (A2: partial+final agg around a shuffle - the reference
            # defers cross-file dedup to its sort stage), and commits
            # snappy parquet; compact_sec then re-reads and runs the
            # A4+A5 merge the reference does with sort -u staging. The
            # parse-only comparable is bench_extract's count-path
            # pages/min/core (EXTRACT_PROFILE.json), measured at or
            # above the reference's 300k on every idle host.
            "unit_scope_note": "import_sec = parse + full column "
                               "materialization + global A2 dedup + "
                               "parquet commit; reference unit = parse "
                               "+ per-file buffer append",
        }
        with open(out_json, "w", encoding="utf-8") as fh:
            json.dump(result, fh, indent=1)
        print(json.dumps(result))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
