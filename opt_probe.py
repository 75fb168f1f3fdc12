"""r12+ optimization probe: isolate registry / FULL_REGISTRY entries.

Times each named entry with the bench's own methodology (codegen warmup
at sf0.001, noop sink, System.gc + clearCache between runs, min-of-N)
and optionally writes the formatted physical plan to plans/<round>/ (round from $SPARK_GRAFT_PLAN_ROUND, default r13).

Usage:
    python opt_probe.py <names_csv> [runs] [plan_tag]

``names_csv``  comma list of entry names; FULL_REGISTRY names allowed.
``runs``       timed repetitions (default 3).
``plan_tag``   when given, write plans/<round>/<name>_<plan_tag>.txt with
               the explain("formatted") output for each entry.

Prints one JSON line {name: {"sec": min, "runs": [...], "rows": n}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

from globallinks_spark.plans.explain import plan_string
from globallinks_spark.queries import FULL_REGISTRY
from globallinks_spark.session import get_spark

_HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    tag = sys.argv[3] if len(sys.argv) > 3 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir

    spark = get_spark(app_name="opt_probe")
    out: dict[str, dict] = {}
    for name in names:
        spec = FULL_REGISTRY[name]
        spark.sparkContext.setJobDescription(f"opt_probe:{name}")
        try:
            spec.fn(spark, warm_dir).write.format("noop").mode(
                "overwrite").save()
        except Exception as exc:
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)
        spark.catalog.clearCache()
        samples: list[float] = []
        for _ in range(runs):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        rec: dict = {"sec": min(samples), "runs": samples}
        if tag:
            os.makedirs(os.path.join(_HERE, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r13")), exist_ok=True)
            path = os.path.join(_HERE, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r13"), f"{name}_{tag}.txt")
            with open(path, "w", encoding="utf-8") as fh:
                fh.write(plan_string(spec.fn(spark, sf_dir), "formatted"))
            rec["plan"] = os.path.relpath(path, _HERE)
        out[name] = rec
        print(f"# {name}: {rec['sec']}s runs={samples}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
