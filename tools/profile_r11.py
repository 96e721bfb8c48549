#!/usr/bin/env python
"""Round-11 measurement harness (guide §1: measure first).

For every bench-suite query: capture .explain("formatted") to
plans/r11/<name>_<TAG>.txt, run it once against the noop sink with the
status REST API on, and record wall seconds + per-query stage/shuffle
telemetry + plan-shape counters (Exchange count, join strategies,
Python-boundary nodes). ONE run per query — this is a profiling pass,
not the bench; medians come from bench.py.

Usage:
  SPARK_GRAFT_PROFILE_TAG=before python tools/profile_r11.py [names...]
Writes /tmp/profile_r11_<TAG>.json
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
os.environ.setdefault("SPARK_GRAFT_UI", "true")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TAG = os.environ.get("SPARK_GRAFT_PROFILE_TAG", "before")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_shape(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin")
        + plan.count("CartesianProduct"),
        "batch_eval_python": plan.count("BatchEvalPython"),
        "arrow_eval_python": plan.count("ArrowEvalPython"),
        "map_in_arrow_or_pandas": plan.count("MapInPandas")
        + plan.count("PythonMapInArrow")
        + plan.count("FlatMapGroupsInPandas"),
        "sorts": plan.count("Sort "),
        "window_nodes": plan.count("Window"),
        "aqe": "AdaptiveSparkPlan" in plan,
    }


def main() -> None:
    from starlight_for_kafka_spark import get_session

    import bench_scale
    import __spark_entry__ as entrymod

    spark = get_session(app="starlight-profile-r11")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()

    import bench as benchmod

    src = open(os.path.join(os.path.dirname(benchmod.__file__), "bench.py")).read()
    suite = re.findall(r'^\s+"([a-z0-9_]+)",', src, re.M)
    if len(sys.argv) > 1:
        suite = sys.argv[1:]

    # warm JVM + file listing
    entrymod.q_list_offsets(spark, SF_DIR).write.mode("overwrite").format(
        "noop"
    ).save()

    from starlight_for_kafka_spark.plans.checkpoints import release_session_storage
    from starlight_for_kafka_spark.plans.inspect import plan_string
    from starlight_for_kafka_spark.operators.multimodal import (
        restore_arrow_batch_cap,
    )

    metrics = bench_scale.StageMetrics(spark)
    out: dict[str, dict] = {}
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r11",
    )
    os.makedirs(plans_dir, exist_ok=True)

    for name in suite:
        df = queries[name](spark, SF_DIR)
        plan = plan_string(df)
        with open(os.path.join(plans_dir, f"{name}_{TAG}.txt"), "w") as f:
            f.write(plan)
        spark.sparkContext.setJobDescription(f"profile:{name}")
        metrics.mark()
        t0 = time.perf_counter()
        queries[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
        wall = round(time.perf_counter() - t0, 3)
        d = metrics.delta()
        spark.sparkContext.setJobDescription(None)
        release_session_storage(spark)
        restore_arrow_batch_cap(spark)
        out[name] = {
            "wall_s": wall,
            **d,
            "plan": plan_shape(plan),
        }
        print(
            f"  {name}: {wall}s, stages={d['n_stages']}, "
            f"shuffle={d['shuffle_write_bytes']/1e6:.1f}MB, "
            f"exch={out[name]['plan']['exchanges']}",
            file=sys.stderr,
        )

    path = f"/tmp/profile_r11_{TAG}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(path)
    spark.stop()


if __name__ == "__main__":
    main()
