"""Driver-side WAT fetcher (S2) — manifest + per-file HTTP download.

The reference downloads the archive manifest
(``https://data.commoncrawl.org/crawl-data/<archive>/wat.paths.gz``,
gunzipped in-flight — InitImport, /root/reference/pkg/commoncrawl/
wat.go:147-218) and each WAT file with bounded retries
(DownloadFile, pkg/fileutils/fileutils.go:37-82: up to ``maxRetries``
re-attempts; a 503 sleeps 20 s with exponential doubling, other
failures sleep a flat 20 s), throttled by a 10 s pause between files
(cmd/importer/main.go:32,252-255) and skipping files already on disk
(main.go:263).

This is deliberately DRIVER-side, stdlib-only code: fetching over HTTP
with politeness throttles is orchestration, not data processing — the
cluster enters at ``spark.read.text(local_or_s3_paths)``. On a real
deployment the fetch step lands files on shared storage (S3/HDFS) and
Spark reads them directly; this module exists so the reference's
"point it at data.commoncrawl.org" workflow works end to end.

``sleep_fn`` / ``base_url`` are injectable so tests drive a local HTTP
fixture through the same code paths (happy / 503-retry / exhausted).
"""

from __future__ import annotations

import gzip
import os
import time
import urllib.error
import urllib.request
from collections.abc import Callable

DEFAULT_BASE_URL = "https://data.commoncrawl.org/"
DEFAULT_RETRY_DELAY_SEC = 20.0  # fileutils.go:41
DEFAULT_THROTTLE_SEC = 10.0     # main.go:32


class DownloadError(RuntimeError):
    """Raised when a URL still fails after all retries."""


def download_file(
    url: str,
    output_path: str,
    max_retries: int = 2,
    retry_delay_sec: float = DEFAULT_RETRY_DELAY_SEC,
    sleep_fn: Callable[[float], None] = time.sleep,
) -> None:
    """GET ``url`` to ``output_path`` with the reference's retry policy
    (fileutils.go:37-82): up to ``max_retries`` re-attempts; 503 backs
    off exponentially from ``retry_delay_sec``, any other failure waits
    a flat ``retry_delay_sec``. Writes via a temp file + rename so a
    killed download never leaves a truncated file that a restart would
    skip as complete."""
    delay = retry_delay_sec
    last_err: Exception | None = None
    for attempt in range(max_retries + 1):
        try:
            with urllib.request.urlopen(url) as resp:
                tmp = output_path + ".part"
                with open(tmp, "wb") as out:
                    while True:
                        chunk = resp.read(1 << 20)
                        if not chunk:
                            break
                        out.write(chunk)
                os.replace(tmp, output_path)
                return
        except urllib.error.HTTPError as e:
            last_err = e
            if attempt == max_retries:
                break  # outcome decided — don't sleep before raising
            if e.code == 503:  # exponential back-off path
                sleep_fn(delay)
                delay *= 2
            else:
                sleep_fn(retry_delay_sec)
        except (urllib.error.URLError, OSError) as e:
            last_err = e
            if attempt == max_retries:
                break
            sleep_fn(retry_delay_sec)
    raise DownloadError(
        f"failed to download url {url} after retries: {last_err}"
    )


def fetch_manifest(
    archive_name: str,
    dest_dir: str,
    base_url: str = DEFAULT_BASE_URL,
    max_retries: int = 2,
    sleep_fn: Callable[[float], None] = time.sleep,
) -> str:
    """Download ``crawl-data/<archive>/wat.paths.gz`` and gunzip it to
    ``<dest_dir>/wat.paths``; returns the decompressed path, ready for
    ``sources.wat.wat_manifest``. (InitImport's download+gunzip half,
    wat.go:152-166; the segment grouping lives in the manifest frame.)"""
    os.makedirs(dest_dir, exist_ok=True)
    gz_path = os.path.join(dest_dir, "wat.paths.gz")
    out_path = os.path.join(dest_dir, "wat.paths")
    url = f"{base_url}crawl-data/{archive_name}/wat.paths.gz"
    download_file(
        url, gz_path, max_retries=max_retries, sleep_fn=sleep_fn
    )
    with gzip.open(gz_path, "rt", encoding="utf-8") as src, \
            open(out_path + ".part", "w", encoding="utf-8") as dst:
        for line in src:
            dst.write(line)
    os.replace(out_path + ".part", out_path)
    return out_path


def fetch_wat_files(
    wat_paths: list[str],
    dest_dir: str,
    base_url: str = DEFAULT_BASE_URL,
    max_retries: int = 2,
    throttle_sec: float = DEFAULT_THROTTLE_SEC,
    sleep_fn: Callable[[float], None] = time.sleep,
) -> list[str]:
    """Download each manifest-relative WAT path into ``dest_dir``,
    pausing ``throttle_sec`` between files (the crawl-host transfer
    limitation, main.go:252-255) and skipping files already present
    (main.go:263 ``!fileutils.FileExists``). Returns local paths in
    input order — the importer's per-segment work list."""
    os.makedirs(dest_dir, exist_ok=True)
    local: list[str] = []
    for i, rel in enumerate(wat_paths):
        out = os.path.join(dest_dir, os.path.basename(rel))
        if not os.path.exists(out):
            if throttle_sec > 0 and i > 0:
                sleep_fn(throttle_sec)
            download_file(
                base_url + rel, out,
                max_retries=max_retries, sleep_fn=sleep_fn,
            )
        local.append(out)
    return local
