"""Extraction-pipeline throughput benchmark (not driver-run; complements
bench.py which covers the query catalog).

Generates a synthetic WAT corpus (N pages of realistic envelope JSON with
~12 links each), runs the full extract → compact pipeline, and reports
pages/min/core next to the reference's documented numbers (BASELINE.md:
up to 300,000 pages/min/thread parse; ~30 s per ~100-200k-page WAT file
per core).

Usage: python bench_extract.py [n_pages] [cores]
"""

from __future__ import annotations

import gzip
import json
import os
import shutil
import sys
import tempfile
import time

from globallinks_spark.operators.compact import compact_segment
from globallinks_spark.operators.extract import extract_links
from globallinks_spark.session import get_spark
from globallinks_spark.sources.wat import read_wat_pages


def _page(i: int) -> dict:
    host = f"site{i % 997}.example{i % 13}.com"
    links = []
    for j in range(12):
        t = (i * 12 + j) % 4999
        links.append({
            "path": "A@/href" if j % 6 else "IMG@/src",
            "url": f"https://target{t}.org/page/{t % 37}"
            if j % 4 else f"/internal/{j}",
            "text": f"anchor text {t}",
            "rel": "nofollow" if j % 11 == 0 else "",
        })
    return {
        "Envelope": {
            "WARC-Header-Metadata": {
                "WARC-Target-URI": f"https://{host}/article/{i}",
                "WARC-Date": f"2023-0{1 + i % 9}-1{i % 9}T10:00:00Z",
                "WARC-IP-Address": f"10.{i % 250}.{(i // 250) % 250}.7",
                "WARC-Type": "response",
            },
            "Payload-Metadata": {"HTTP-Response-Metadata": {"HTML-Metadata": {
                "Head": {"Title": f"Title {i}", "Metas": [], "Link": []},
                "Links": links,
            }}},
        }
    }


IO_PROBE_ROWS = 8_000_000
IO_PROBE_DIR = os.path.join(tempfile.gettempdir(), "sparklinks_io_probe")
_io_probe_warm = False


def parquet_io_probe(spark) -> float:
    """One fixed-size parquet scan+write round trip (min-of-2) — the
    I/O-shaped host-window probe (r10 verdict #2). The strhash probe is
    pure CPU and measured BLIND to I/O/scheduler windows: Pearson r
    0.18 against extract noise in r8, and quiet during 4 of the 5
    entry slowdowns it was asked to adjudicate in r10
    (BENCH_R10_WINDOWS.json). This probe pays the same cost classes as
    the bench workload itself — parquet decode+encode, filesystem
    read/write, allocation — over a deterministic 8M-row/~278 MB
    source (range + sha2, byte-identical across builds, cached under
    /tmp with a _COMPLETE marker).

    min-of-3 (r11 verdict #5 — was min-of-2): a window must persist
    across all passes to move the figure, the same persistence needed
    to move an entry's min-of-2/3 samples. Single passes measured a
    1.46x quiet-host spread — wider than the 1.3x regression wire —
    quiet min-of-2 spread to ~1.25x of the pin, leaving a blind band
    under the 1.5x window threshold; min-of-3 tightens the quiet
    spread (r12 recalibration trials in bench.PIN_PROVENANCE), so a
    reading near the 1.5x band is evidence, not sampling noise. The
    pinned quiet figure is bench.PINNED_IO_PROBE_SEC."""
    global _io_probe_warm
    src = os.path.join(IO_PROBE_DIR, "src.parquet")
    marker = os.path.join(IO_PROBE_DIR, "_COMPLETE")
    if not os.path.exists(marker):
        spark.range(IO_PROBE_ROWS, numPartitions=8).selectExpr(
            "id", "sha2(cast(id as string), 256) as s", "id % 1000 as k"
        ).write.mode("overwrite").parquet(src)
        open(marker, "w").close()
    dst = os.path.join(IO_PROBE_DIR, "dst.parquet")

    def one() -> float:
        t0 = time.perf_counter()
        spark.read.parquet(src).write.mode("overwrite").parquet(dst)
        return time.perf_counter() - t0

    if not _io_probe_warm:
        one()  # codegen warm, once per process
        _io_probe_warm = True
    return round(min(one(), one(), one()), 3)


def host_calibration(spark) -> dict:
    """Single-core JVM arithmetic probe: sum(id*id) over a one-partition
    range — whole-stage-codegen'd, allocation-free, cache-insensitive.
    Rounds 3-6 saw identical code swing ~3× across driver-provisioned
    hosts (r5: 303k pages/min/core standalone; r6 host: ~110k on an
    idle machine, steal≈0) — without a host-speed index in the artifact
    every cross-round comparison conflates host and code. min-of-3;
    the CPU model string rides along for provenance."""
    import time as _time

    # string-cast + xxhash64: allocation- and branch-heavy JVM work, the
    # same regime as the extract kernel (JSON fields, URL strings) — a
    # pure-arithmetic loop is useless here because HotSpot vectorizes it
    # (measured 1.6B mul/mod/sum rows in 0.15 s) and then the index
    # tracks the host's SIMD width, not its scalar/memory speed.
    # bit_xor keeps the aggregate overflow-free in ANSI mode.
    def _probe(n_rows: int, parts: int) -> float:
        def build():
            # a FRESH DataFrame per timed run: re-collecting the same
            # instance reuses its materialized AQE shuffle stage, so the
            # partial-agg (= all the work) would be measured once and
            # then skipped (observed: 4.6 s cold, 0.06 s "warm")
            return spark.range(n_rows, numPartitions=parts).selectExpr(
                "bit_xor(xxhash64(cast(id as string))) as s"
            )

        build().collect()  # codegen warm
        best = float("inf")
        for _ in range(3):
            t0 = _time.perf_counter()
            build().collect()
            best = min(best, _time.perf_counter() - t0)
        return best

    best = _probe(20_000_000, 1)
    # 8-way variant (same per-core work × 8): a host that throttles
    # under parallel load shows the 8-core probe off the 1-core pace
    best8 = _probe(160_000_000, 8)
    model = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    # r10 verdict #2: the I/O-shaped probe rides next to the CPU one in
    # every host stamp, so fresh-JVM extract samples carry BOTH figures
    # and bench.py can correlate each against the run's extract time.
    try:
        io_sec = parquet_io_probe(spark)
    except Exception:
        io_sec = None
    return {
        "jvm_1core_20M_strhash_sec": round(best, 3),
        "jvm_8core_160M_strhash_sec": round(best8, 3),
        "parquet_io_probe_sec": io_sec,
        "cpu_model": model,
    }


def _write_corpus_file(args: tuple[str, int, int]) -> None:
    path, lo, hi = args
    with gzip.open(path, "wt", encoding="utf-8") as out:
        for i in range(lo, hi):
            out.write("WARC-Type: metadata\n")
            out.write(json.dumps(_page(i)) + "\n")


def ensure_corpus(n_pages: int, n_files: int, work: str) -> list[str]:
    """Deterministic synthetic WAT corpus under ``work`` (generated once,
    _COMPLETE-marked — identical bytes across builds since _page() is
    pure); returns the sorted gzip paths. Shared by measure_extract and
    the attribution probes so they read the very same corpus. Files are
    independent page ranges, so generation (untimed, pure-Python, and
    minutes-long at the 10M-page rungs) runs in a process pool."""
    per_file = n_pages // n_files
    if not os.path.exists(os.path.join(work, "_COMPLETE")):
        os.makedirs(work, exist_ok=True)
        jobs = [
            (os.path.join(work, f"bench-{f:05d}.warc.wat.gz"),
             f * per_file, (f + 1) * per_file)
            for f in range(n_files)
        ]
        if len(jobs) > 1:
            from concurrent.futures import ProcessPoolExecutor

            with ProcessPoolExecutor(
                max_workers=min(len(jobs), os.cpu_count() or 8)
            ) as pool:
                list(pool.map(_write_corpus_file, jobs))
        else:
            _write_corpus_file(jobs[0])
        open(os.path.join(work, "_COMPLETE"), "w").close()
    return [os.path.join(work, p) for p in sorted(os.listdir(work))
            if p.endswith(".gz")]


def measure_extract(spark, n_pages: int, cores: int) -> dict:
    """Generate a synthetic WAT corpus, run extract (+compact), return
    the measurement dict. ``spark`` is reused (bench.py passes its own
    session); ``cores`` only scales the pages/min/core normalization.

    Warmup: three throwaway passes. The first triggers Janino codegen
    and queues HotSpot C2 compilation of the big generated methods; the
    later ones let C2 finish replacing interpreted frames. The timed pass
    then reflects steady-state throughput — the regime that matters for
    a 90k-file archive import that runs for hours (the reference's
    ~30 s/WAT baseline is equally sustained-regime,
    cmd/importer/main.go:332 logs per-file times mid-run)."""
    # WATBENCH_CACHE_DIR: reuse the generated corpus across subprocess
    # runs (generation is single-threaded Python and NOT part of any
    # timed window — at the 10M-page scaling rung it costs minutes per
    # run for identical bytes; the deterministic _page() content makes
    # the cache exact). Unset → the original per-run tempdir.
    cache_root = os.environ.get("WATBENCH_CACHE_DIR")
    # WATBENCH_N_FILES: override the one-file-per-core default — the
    # cluster-split rung (r11 verdict #3) reads 10M pages as 64 gzip
    # files (~156k pages/task, the archive-layout shape) instead of 8
    # fat ones, so the A2 dedup's per-map-task agg state matches what a
    # real segment import carries.
    n_files = int(os.environ.get("WATBENCH_N_FILES", "0")) or max(cores, 1)
    if cache_root:
        work = os.path.join(cache_root, f"n{n_pages}_f{n_files}")
        cleanup = False
    else:
        work = tempfile.mkdtemp(prefix="watbench-")
        cleanup = True
    try:
        paths = ensure_corpus(n_pages, n_files, work)
        links = extract_links(read_wat_pages(spark, paths))
        for _ in range(3):
            links.count()
        # warm the materialized plan too (different generated code: the
        # full projection + noop sink)
        links.write.format("noop").mode("overwrite").save()

        # min-of-2 timed passes, same policy as bench.py's query loop:
        # the first timed pass in a fresh JVM can still carry tail-end
        # C2 compilation, and when bench.py calls this after its 70+
        # query runs the old-gen is full of dead broadcast/cache blocks
        # whose collection lands on whichever pass runs first. A GC
        # hint before timing plus taking the minimum isolates the
        # sustained-regime number both claims cite.
        spark.sparkContext._jvm.System.gc()
        t_extract, n_links = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            n_links = links.count()
            t_extract = min(t_extract, time.perf_counter() - t0)

        # materialized pass — count() on extract_links stops at the A2
        # dedup aggregate's grouping keys, so ColumnPruning drops the
        # non-key output columns (text scrub, subdomain, flags) AND the
        # JSON fields feeding them; the reference's parse loop always
        # produces every field. A noop sink forces the full 14-column
        # row, giving the honest "produce every output column" figure
        # next to the parse+gate one (same count-vs-materialize split
        # bench.py applies to the query catalog).
        spark.sparkContext._jvm.System.gc()
        t_mat = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            links.write.format("noop").mode("overwrite").save()
            t_mat = min(t_mat, time.perf_counter() - t0)

        # same GC hint as the extract loop (the stated min-of-2 policy):
        # without it, compact timings can absorb old-gen collection of
        # the extract passes' dead blocks.
        spark.sparkContext._jvm.System.gc()
        t_compact, n_compact = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            n_compact = compact_segment(links).count()
            t_compact = min(t_compact, time.perf_counter() - t0)

        pages_min_core = n_pages / (t_extract / 60) / cores
        return {
            "metric": "extract_pages_per_min_per_core",
            "host": host_calibration(spark),
            "value": round(pages_min_core),
            "unit": "pages/min/core",
            "n_pages": n_pages,
            "cores": cores,
            "extract_sec": round(t_extract, 2),
            "materialize_sec": round(t_mat, 2),
            "materialized_pages_per_min_per_core": round(
                n_pages / (t_mat / 60) / cores
            ),
            "compact_sec": round(t_compact, 2),
            "links_out": n_links,
            "compacted_out": n_compact,
            "reference_baseline": "300000 pages/min/thread (README.md:8)",
        }
    finally:
        if cleanup:
            shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_CPUS", "8")
    )
    spark = get_spark(
        app_name="extract_bench", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    print(json.dumps(measure_extract(spark, n_pages, cores)))
    spark.stop()


if __name__ == "__main__":
    main()
