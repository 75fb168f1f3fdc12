"""WAT fetcher (S2) against a local HTTP fixture: happy path, 503
retry with exponential back-off, retry exhaustion, manifest gunzip,
throttle pacing, and skip-if-exists restart behavior (reference:
fileutils.go:37-82, wat.go:147-218, main.go:252-263)."""

from __future__ import annotations

import gzip
import http.server
import os
import threading

import pytest

from globallinks_spark.sources.fetch import (
    DownloadError,
    download_file,
    fetch_manifest,
    fetch_wat_files,
)

MANIFEST_LINES = [
    "crawl-data/CC-MAIN-2023-06/segments/1674764494826.88/wat/"
    "CC-MAIN-20230206105756-20230206135756-00000.warc.wat.gz",
    "crawl-data/CC-MAIN-2023-06/segments/1674764494826.88/wat/"
    "CC-MAIN-20230206105756-20230206135756-00001.warc.wat.gz",
]


class _Handler(http.server.BaseHTTPRequestHandler):
    # per-path list of status codes to emit before succeeding
    fail_plan: dict[str, list[int]] = {}
    hits: list[str] = []

    def do_GET(self):  # noqa: N802 (stdlib naming)
        cls = type(self)
        cls.hits.append(self.path)
        plan = cls.fail_plan.get(self.path)
        if plan:
            code = plan.pop(0)
            self.send_response(code)
            self.end_headers()
            return
        if self.path.endswith("wat.paths.gz"):
            body = gzip.compress(("\n".join(MANIFEST_LINES) + "\n").encode())
        else:
            body = f"payload-of:{self.path}".encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence test output
        pass


@pytest.fixture()
def http_base():
    _Handler.fail_plan = {}
    _Handler.hits = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/"
    srv.shutdown()


class TestDownloadFile:
    def test_happy_path(self, http_base, tmp_path):
        out = str(tmp_path / "f.bin")
        download_file(http_base + "some/file", out, sleep_fn=lambda s: None)
        assert open(out).read() == "payload-of:/some/file"
        assert not os.path.exists(out + ".part")

    def test_503_retries_with_exponential_backoff(self, http_base, tmp_path):
        _Handler.fail_plan["/flaky"] = [503, 503]
        sleeps: list[float] = []
        out = str(tmp_path / "f.bin")
        download_file(http_base + "flaky", out, sleep_fn=sleeps.append)
        assert open(out).read() == "payload-of:/flaky"
        assert sleeps == [20.0, 40.0]  # doubling, fileutils.go:50

    def test_retries_exhausted_raises(self, http_base, tmp_path):
        _Handler.fail_plan["/dead"] = [503, 503, 503, 503]
        out = str(tmp_path / "f.bin")
        with pytest.raises(DownloadError):
            download_file(
                http_base + "dead", out, max_retries=2,
                sleep_fn=lambda s: None,
            )
        assert not os.path.exists(out)  # no truncated output left behind

    def test_non_503_error_flat_delay_then_success(self, http_base, tmp_path):
        _Handler.fail_plan["/hiccup"] = [500]
        sleeps: list[float] = []
        out = str(tmp_path / "f.bin")
        download_file(http_base + "hiccup", out, sleep_fn=sleeps.append)
        assert sleeps == [20.0]  # flat delay, no doubling


class TestManifest:
    def test_fetch_and_gunzip(self, http_base, tmp_path):
        path = fetch_manifest(
            "CC-MAIN-2023-06", str(tmp_path), base_url=http_base,
            sleep_fn=lambda s: None,
        )
        lines = open(path).read().splitlines()
        assert lines == MANIFEST_LINES
        # integrates with the manifest → segment grouping (S1)
        assert "/segments/1674764494826.88/" in lines[0]


class TestRunFetch:
    def test_manifest_to_local_segment_files(self, http_base, tmp_path, spark):
        """fetch CLI path end-to-end: manifest download → segment
        selection (O5) → throttled per-file download → local work list
        ready for run_import."""
        from globallinks_spark.runner import run_fetch

        local = run_fetch(
            spark, "CC-MAIN-2023-06", str(tmp_path),
            base_url=http_base, throttle_sec=0,
        )
        assert [os.path.basename(p) for p in local] == [
            os.path.basename(p) for p in MANIFEST_LINES
        ]
        assert all(os.path.exists(p) for p in local)
        assert "/wat/1674764494826.88/" in local[0].replace(os.sep, "/")


class TestFetchWatFiles:
    def test_downloads_throttles_and_skips_existing(
        self, http_base, tmp_path
    ):
        sleeps: list[float] = []
        local = fetch_wat_files(
            MANIFEST_LINES, str(tmp_path), base_url=http_base,
            throttle_sec=10.0, sleep_fn=sleeps.append,
        )
        assert [os.path.basename(p) for p in local] == [
            os.path.basename(p) for p in MANIFEST_LINES
        ]
        assert all(os.path.exists(p) for p in local)
        # one throttle pause between the two downloads, none before the first
        assert sleeps == [10.0]

        # restart: everything on disk → no HTTP hits, no sleeps
        _Handler.hits = []
        sleeps.clear()
        again = fetch_wat_files(
            MANIFEST_LINES, str(tmp_path), base_url=http_base,
            throttle_sec=10.0, sleep_fn=sleeps.append,
        )
        assert again == local
        assert _Handler.hits == []
        assert sleeps == []


class _WatHandler(_Handler):
    """Serves REAL gzip WAT bytes for the end-to-end importer flow."""

    def do_GET(self):  # noqa: N802
        import io
        import tempfile

        cls = type(self)
        cls.hits.append(self.path)
        if self.path.endswith("wat.paths.gz"):
            body = gzip.compress(("\n".join(MANIFEST_LINES) + "\n").encode())
        else:
            from fixtures import _envelope, a, write_wat_file

            with tempfile.NamedTemporaryFile(suffix=".gz") as tf:
                write_wat_file(tf.name)
                body = open(tf.name, "rb").read()
            if self.path.endswith("00001.warc.wat.gz"):
                # second file carries one extra unique page so tests can
                # tell which files were imported (concatenated gzip
                # members are a valid gzip stream)
                import json

                extra = _envelope(
                    "https://only-in-file-two.example.org/x",
                    "2023-02-04T10:00:00Z", "10.0.0.9",
                    [a("https://target.example.net/y")],
                )
                body += gzip.compress(
                    ("WARC-Type: metadata\n"
                     + json.dumps(extra) + "\n").encode()
                )
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def wat_http_base():
    _WatHandler.fail_plan = {}
    _WatHandler.hits = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _WatHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/"
    srv.shutdown()


class TestRunArchive:
    def test_importer_end_to_end_and_rerun_safe(
        self, wat_http_base, tmp_path, spark
    ):
        """The reference's single importer binary: manifest → download →
        import → compact in one call; a second call selects no new
        segment (the only one carries a _SUCCESS marker) and re-downloads
        nothing."""
        from globallinks_spark.runner import run_archive

        data = str(tmp_path)
        done = run_archive(
            spark, "CC-MAIN-2023-06", data,
            base_url=wat_http_base, throttle_sec=0,
        )
        assert done == ["1674764494826.88"]
        links = spark.read.parquet(
            os.path.join(data, "links", "segment=1674764494826.88")
        )
        assert links.count() > 0
        compacted = spark.read.parquet(
            os.path.join(data, "compact", "segment=1674764494826.88")
        )
        assert compacted.count() > 0

        wat_hits_before = [h for h in _WatHandler.hits if "/wat/CC-" in h]
        done2 = run_archive(
            spark, "CC-MAIN-2023-06", data,
            base_url=wat_http_base, throttle_sec=0,
        )
        assert done2 == []  # no segment left to import
        wat_hits_after = [h for h in _WatHandler.hits if "/wat/CC-" in h]
        assert wat_hits_before == wat_hits_after  # nothing re-downloaded

    def test_max_files_truncates_work_list(
        self, wat_http_base, tmp_path, spark
    ):
        from globallinks_spark.runner import run_archive

        done = run_archive(
            spark, "CC-MAIN-2023-06", str(tmp_path), max_files=1,
            base_url=wat_http_base, throttle_sec=0,
        )
        assert done == ["1674764494826.88"]
        wat_hits = [h for h in _WatHandler.hits if "/wat/CC-" in h]
        assert len(wat_hits) == 2  # both downloaded (fetch is eager)...
        # ...but only file 00000 imported: the page unique to 00001 must
        # be absent from the link output
        links = spark.read.parquet(
            os.path.join(str(tmp_path), "links", "segment=1674764494826.88")
        )
        assert links.count() > 0
        assert (
            links.filter("page_host = 'only-in-file-two.example.org'").count()
            == 0
        )

    def test_max_files_zero_rejected(self, wat_http_base, tmp_path, spark):
        """max_files=0 used to slice the work list to [] and crash on
        local[0] with IndexError (round-2 advice) — reject it up front."""
        import pytest

        from globallinks_spark.runner import run_archive

        with pytest.raises(ValueError, match="max_files"):
            run_archive(
                spark, "CC-MAIN-2023-06", str(tmp_path), max_files=0,
                base_url=wat_http_base, throttle_sec=0,
            )


class TestFinalAttemptNoSleep:
    def test_no_sleep_after_last_failure(self, http_base, tmp_path):
        """Exhausted retries must raise immediately — sleeping after the
        outcome is decided adds 20-80 s per permanently-failing URL
        (hours over a 90k-file manifest)."""
        _Handler.fail_plan["/gone"] = [503, 503, 503]
        sleeps: list[float] = []
        with pytest.raises(DownloadError):
            download_file(
                http_base + "gone", str(tmp_path / "f"),
                max_retries=2, sleep_fn=sleeps.append,
            )
        assert sleeps == [20.0, 40.0]  # no third sleep before the raise


class TestRunArchiveSkipsMissingNamedSegment:
    def test_bogus_segment_does_not_abandon_rest(
        self, wat_http_base, tmp_path, spark
    ):
        from globallinks_spark.runner import run_archive

        done = run_archive(
            spark, "CC-MAIN-2023-06", str(tmp_path),
            segments=["no-such-segment", "1674764494826.88"],
            max_segments=2,
            base_url=wat_http_base, throttle_sec=0,
        )
        assert done == ["1674764494826.88"]
