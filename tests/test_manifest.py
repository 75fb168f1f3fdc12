"""Manifest / orchestration parity: archive-format gate
(wat_test.go:597-618 table), manifest parsing (S1), segment selection (O5)."""

from __future__ import annotations

import pytest

from globallinks_spark.sources.wat import (
    is_correct_archive_format,
    select_segment,
    wat_manifest,
)


class TestArchiveFormat:
    # exact table from the reference test
    @pytest.mark.parametrize("name,want", [
        ("CC-MAIN-2023-01", True),
        ("CC-MAIN-2023-12", True),
        ("CC-MAIN-2023", False),
        ("CC-MAIN-23-01", False),
        ("CC-MAIN-202301", False),
        ("XX-MAIN-2023-01", False),
    ])
    def test_table(self, name, want):
        assert is_correct_archive_format(name) is want


@pytest.fixture(scope="module")
def manifest(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("mani") / "wat.paths"
    lines = [
        "crawl-data/CC-MAIN-2024-10/segments/1707947473735.7/wat/"
        f"CC-MAIN-20240221045319-20240221075319-{i:05d}.warc.wat.gz"
        for i in range(3)
    ] + [
        "crawl-data/CC-MAIN-2024-10/segments/1707947473800.2/wat/"
        f"CC-MAIN-20240221045319-20240221075319-{i:05d}.warc.wat.gz"
        for i in range(2)
    ]
    p.write_text("\n".join(lines) + "\n")
    return wat_manifest(spark, str(p))


class TestManifest:
    def test_segments_and_numbers(self, manifest):
        rows = manifest.collect()
        assert len(rows) == 5
        segs = {r.segment for r in rows}
        assert segs == {"1707947473735.7", "1707947473800.2"}
        assert all(r.file_number.isdigit() for r in rows)

    def test_select_segment_ordered(self, manifest):
        assert select_segment(manifest, set()) == "1707947473735.7"

    def test_select_segment_skips_done(self, manifest):
        assert select_segment(manifest, {"1707947473735.7"}) == \
            "1707947473800.2"

    def test_select_segment_exhausted(self, manifest):
        done = {"1707947473735.7", "1707947473800.2"}
        assert select_segment(manifest, done) is None

    def test_select_segment_by_id(self, manifest):
        assert select_segment(manifest, set(), "1707947473800.2") == \
            "1707947473800.2"
        assert select_segment(manifest, set(), "nope") is None
