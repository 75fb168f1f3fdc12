"""Registry-wide physical-plan audit report (companion to the blanket
CI gate in tests/test_plans.py, which asserts zero error-severity
findings for every FULL_REGISTRY entry).

Where the CI gate is binary, this report RECORDS the full audit
surface per entry — shuffle count, sort-merge joins, single-partition
exchanges, warn/error findings — so plan-shape drift between rounds is
diffable the way bench timings are. AQE is disabled for the audit
session: pre-execution plan strings are deterministic only without
runtime re-planning (the executed plan can only get better under AQE —
broadcast conversion, skew splitting).

Writes PLAN_AUDIT.json. Usage: python plan_audit_report.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

from globallinks_spark.plans.explain import audit
from globallinks_spark.queries import FULL_REGISTRY
from globallinks_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan_audit_report")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    entries: dict[str, dict] = {}
    totals = {"error": 0, "warn": 0, "smj": 0, "single_partition": 0,
              "shuffles": 0, "audited": 0, "errored": 0}
    for name in sorted(FULL_REGISTRY):
        try:
            findings = audit(FULL_REGISTRY[name].fn(spark, sf_dir))
        except Exception as exc:
            entries[name] = {"err": str(exc)[:160]}
            totals["errored"] += 1
            continue
        by = {f["pattern"]: f for f in findings}
        n_shuffles = 0
        for f in findings:
            if f["pattern"] == "shuffle-count":
                n_shuffles = int(f["detail"].split()[0])
        row = {
            "shuffles": n_shuffles,
            "smj": int(by["SortMergeJoin"]["detail"].split()[0])
            if "SortMergeJoin" in by else 0,
            "single_partition": int(
                by["Exchange SinglePartition"]["detail"].split()[0]
            ) if "Exchange SinglePartition" in by else 0,
            "warns": sorted(
                f["pattern"] for f in findings if f["severity"] == "warn"
            ),
            "errors": sorted(
                f["pattern"] for f in findings if f["severity"] == "error"
            ),
        }
        entries[name] = row
        totals["audited"] += 1
        totals["error"] += len(row["errors"])
        totals["warn"] += len(row["warns"])
        totals["smj"] += row["smj"]
        totals["single_partition"] += row["single_partition"]
        totals["shuffles"] += row["shuffles"]

    top_shuffles = sorted(
        ((n, e["shuffles"]) for n, e in entries.items() if "shuffles" in e),
        key=lambda kv: -kv[1],
    )[:10]
    out = {
        "metric": "plan_audit_report",
        "sf_dir": sf_dir,
        "aqe": "disabled for deterministic pre-execution plans",
        "totals": totals,
        "top_shuffle_entries": dict(top_shuffles),
        "entries": entries,
    }
    with open("PLAN_AUDIT.json", "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"totals": totals, "top": dict(top_shuffles[:5])}))
    spark.stop()


if __name__ == "__main__":
    main()
