"""Pipe-text interchange round-trip + F15 malformed-row gate
(readers cmd/importer/main.go:393-431, writers wat.go:849-931)."""

from __future__ import annotations

import datetime
import gzip
import os

from globallinks_spark.schemas import LINK_SCHEMA
from globallinks_spark.sources.pipe_text import read_links, write_pipe

D = datetime.date

ROW = ("blog.edu.pl", "", "/czasopisma/", "", "2", "turysta24.pl",
       "/tabletki/", "", "2", "Theme Palace", 0, 0, D(2023, 2, 4),
       "51.75.43.178")


class TestRoundTrip:
    def test_write_read(self, spark, tmp_path):
        df = spark.createDataFrame([ROW], LINK_SCHEMA)
        out = str(tmp_path / "links")
        write_pipe(df, out, LINK_SCHEMA)
        back = read_links(spark, out).collect()
        assert len(back) == 1
        assert tuple(back[0]) == ROW

    def test_byte_format_matches_reference(self, spark, tmp_path):
        """The serialized line must byte-match the reference's 14-field
        pipe layout (wat.go:902-917; example README.md:436)."""
        df = spark.createDataFrame([ROW], LINK_SCHEMA)
        out = str(tmp_path / "links2")
        write_pipe(df, out, LINK_SCHEMA)
        lines = []
        for part in os.listdir(out):
            if not part.startswith("part-"):
                continue
            opener = gzip.open if part.endswith(".gz") else open
            with opener(os.path.join(out, part), "rt") as f:
                lines += [l.rstrip("\n") for l in f if l.strip()]
        assert len(lines) == 1
        assert lines[0] == (
            "blog.edu.pl||/czasopisma/||2|turysta24.pl|/tabletki/||2|"
            "Theme Palace|0|0|2023-02-04|51.75.43.178"
        )

    def test_malformed_rows_skipped(self, spark, tmp_path):
        """F15 — wrong field count skips the row, never fails the scan."""
        p = tmp_path / "raw.txt"
        good = "|".join([
            "d.com", "", "/p", "", "2", "s.com", "/a", "", "2", "t",
            "0", "0", "2023-01-01", "1.1.1.1",
        ])
        p.write_text(good + "\n" + "too|few|fields\n" + good + "|extra\n")
        rows = read_links(spark, str(p)).collect()
        assert len(rows) == 1
        assert rows[0].link_domain == "d.com"
        assert rows[0].date_imported == D(2023, 1, 1)
        assert rows[0].no_follow == 0
