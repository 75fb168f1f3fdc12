"""Measure the SQ serving path's byte-pruning claim with REAL scan
metrics (r8 verdict #2): the SERVING_ROUTING_TABLE's equivalent-scan
fractions rest on an arithmetic bytes ratio (ceil(dim·nbits/8) code
bytes vs 4·dim float32 — 0.125 for int4, 0.25 for int8). Nobody had
measured actual parquet bytes read for a code scan vs a full-vector
scan, and parquet encoding (list repetition levels on the vector side,
incompressible binary on the code side, zstd on both) can move the
real ratio either way.

Method: on a 200k-row dim-64 HIGH-ENTROPY corpus (xxhash64-derived
uniform floats — deterministic, and the scale-realistic shape: real
embedding columns are near-incompressible), write the full-precision
frame (vec_id, embedding) and the :func:`sq_index` frames (id,
sq_code, sq_scale, sq_norm; nbits 4 and 8) as parquet WITH THE SAME
writer (zstd, one session), then run each scan through its real
scoring kernel to a noop sink and read the stage input metrics from
the Spark REST API (spark.ui.enabled=true for this probe only).
measured ratio = code-scan bytesRead / vector-scan bytesRead.

The 100×-replicated scaling corpus is deliberately NOT the headline
here: it replicates sf0.1 100×, zstd collapses the repeats ~380× on
BOTH sides, and fixed page overhead then dominates the ratio (first
run of this probe measured 0.71 for sq4 on it — an artifact of
replication, not of the code layout). Its figures are recorded under
`replicated_corpus_caveat` so the distortion is documented, not
hidden.

The measured ratio counts EVERYTHING the serving scan actually reads —
id, scale, norm, page headers — not only the code bytes, so it is the
honest cost lever; if it exceeds ~1.5× the arithmetic ratio the
routing table's fractions are corrected to the measured figure
(r8 verdict #2 done-criterion).

Writes the `measured_bytes` section into ANN_RECALL.json (preserving
every existing field). Run serially on an idle machine.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

from pyspark.sql import functions as F

from globallinks_spark.operators import similarity as S
from globallinks_spark.session import get_spark

OUT = "ANN_RECALL.json"


_UNITS = {"B": 1, "KiB": 1 << 10, "MiB": 1 << 20, "GiB": 1 << 30,
          "TiB": 1 << 40}


def _parse_size(text: str) -> float:
    """Spark UI formatted size ('45.2 MiB') → bytes."""
    val, unit = text.split()
    return float(val.replace(",", "")) * _UNITS[unit]


def _sql_executions(spark) -> list:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = (f"{base}/api/v1/applications/{app}/sql"
           f"?details=true&planDescription=false&length=10000")
    with urllib.request.urlopen(url, timeout=30) as resp:
        return json.loads(resp.read())


def _scan_bytes_since(spark, prev_count: int) -> float:
    """Sum the parquet scan nodes' 'size of files read' metric over
    every SQL execution recorded after ``prev_count``. The STAGE-level
    inputBytes metric under-reports on the local filesystem (a plain
    full read of a 47.8 MB file stamps 170 KB — the Hadoop
    FileSystem.Statistics path misses the vectorized reader's
    positioned reads), so the scan OPERATOR's own metric is the
    trustworthy source."""
    total = 0.0
    for q in _sql_executions(spark)[prev_count:]:
        for node in q.get("nodes", []):
            if not node.get("nodeName", "").startswith("Scan parquet"):
                continue
            for m in node.get("metrics", []):
                if m["name"] == "size of files read":
                    total += _parse_size(m["value"])
    return total


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


N_ROWS = 200_000
DIM = 64


def _entropy_corpus(spark):
    """Deterministic high-entropy embeddings: dim uniform floats in
    [-1, 1) per row from xxhash64(vec_id, i) — no replication, so
    parquet pages carry near-raw bytes (the real-embedding shape)."""
    return spark.range(N_ROWS).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(2_000_000))
                / 1_000_000.0 - 1.0
            ).cast("float"),
        ).alias("embedding"),
    )


def main() -> None:
    spark = get_spark(
        app_name="sq_bytes_probe",
        extra_conf={"spark.ui.enabled": "true"},
    )
    emb = _entropy_corpus(spark)
    # guarded fetch (ADVICE r9 low #3): raise a named error on an empty
    # corpus instead of a bare TypeError from .first()["embedding"]
    qrow = emb.orderBy("vec_id").first()
    if qrow is None:
        raise ValueError("sq_bytes_probe: entropy corpus is empty")
    qvec = [float(x) for x in qrow["embedding"]]
    dim = DIM

    # one writer for every table: same codec, same session — the
    # comparison is column WIDTH, not writer settings
    vec_path = "/tmp/sq_bytes_probe_vectors.parquet"
    emb.select("vec_id", "embedding").write.mode("overwrite").parquet(
        vec_path)
    idx_paths = {}
    for nbits in (4, 8):
        p = f"/tmp/sq_bytes_probe_idx{nbits}.parquet"
        S.sq_index(emb, nbits=nbits).write.mode("overwrite").parquet(p)
        idx_paths[nbits] = p

    def measure(scan_fn) -> tuple[int, float]:
        # warm once (codegen + page cache parity), then measure
        scan_fn()
        before = len(_sql_executions(spark))
        t0 = time.perf_counter()
        scan_fn()
        dt = time.perf_counter() - t0
        return int(_scan_bytes_since(spark, before)), dt

    # full-precision scan: the exact brute-force kernel over the
    # persisted full-width table (what a no-index serving scan reads)
    vecs = spark.read.parquet(vec_path)
    vec_bytes, vec_sec = measure(
        lambda: _noop(S.cosine_topk(vecs, qvec, k=10)))

    out = {
        "corpus_rows": vecs.count(),
        "dim": dim,
        "corpus": (
            "deterministic high-entropy xxhash64-derived uniform "
            "floats (near-incompressible — the real-embedding shape)"
        ),
        "method": (
            "parquet scan operator's 'size of files read' metric (SQL "
            "REST endpoint) around one warmed scan per variant; same "
            "zstd parquet writer for every table; measured_bytes_ratio "
            "= code scan bytes / full-vector scan bytes — includes "
            "id/scale/norm columns and page overhead, i.e. everything "
            "the serving scan actually reads. Stage-level inputBytes "
            "is NOT used: it under-reports ~300x on the local "
            "filesystem (vectorized reader's positioned reads miss "
            "the FileSystem.Statistics accounting)"
        ),
        "replicated_corpus_caveat": (
            "on the 100x-replicated scaling corpus zstd collapses the "
            "repeated pages ~380x on both sides and page overhead "
            "dominates (first probe run measured sq4=0.71, sq8=1.06 "
            "there — a replication artifact, not a layout property); "
            "byte ratios must be measured on entropy-realistic data"
        ),
        "vector_scan": {"bytes_read": vec_bytes,
                        "sec": round(vec_sec, 2)},
        "variants": {},
    }
    for nbits, path in idx_paths.items():
        idx = spark.read.parquet(path)
        code_bytes, code_sec = measure(
            lambda idx=idx: _noop(S.sq_scores(idx, qvec, nbits=nbits)))
        arith = ((dim * nbits + 7) // 8) / float(4 * dim)
        measured = code_bytes / float(vec_bytes)
        out["variants"][f"sq{nbits}"] = {
            "bytes_read": code_bytes,
            "sec": round(code_sec, 2),
            "arithmetic_bytes_ratio": round(arith, 5),
            "measured_bytes_ratio": round(measured, 5),
            "measured_over_arithmetic": round(measured / arith, 2),
        }
        print(f"# sq{nbits}: {code_bytes:,} B vs vector "
              f"{vec_bytes:,} B → measured {measured:.4f} "
              f"(arith {arith:.4f})", file=sys.stderr)

    with open(OUT, encoding="utf-8") as fh:
        artifact = json.load(fh)
    artifact["measured_bytes"] = out
    # correct the SQ variants' cost decomposition to the measured
    # figures (r8 verdict #2 done-criterion: measured exceeded ~1.5x
    # arithmetic for sq4 once id/scale/norm + page overhead count, so
    # the table carries the measured ratio): candidate_fraction =
    # rows_scored_fraction × measured_bytes_ratio + rerank_rows_fraction
    for key, row in artifact.get("variants", {}).items():
        m = None
        for nbits in (4, 8):
            if f"sq{nbits}" in key:
                m = out["variants"][f"sq{nbits}"]
        if m is None or "rows_scored_fraction" not in row:
            continue
        row["arithmetic_bytes_ratio"] = m["arithmetic_bytes_ratio"]
        row["bytes_per_row_ratio"] = m["measured_bytes_ratio"]
        row["candidate_fraction"] = round(
            row["rows_scored_fraction"] * m["measured_bytes_ratio"]
            + row["rerank_rows_fraction"], 5)
        row["lift_over_random"] = round(
            row["recall_at_k"] / row["candidate_fraction"], 1)
    with open(OUT, "w", encoding="utf-8") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps({k: v["measured_bytes_ratio"]
                      for k, v in out["variants"].items()}))
    spark.stop()


if __name__ == "__main__":
    main()
