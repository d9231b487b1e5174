"""Diagnose strong-scaling loss in the KG probe: run the probe job at
a given local[N], then dump per-stage executor metrics (runTime,
cpuTime, jvmGcTime, scheduler side) from the Spark REST API.

    python tools/diag_scaling.py CPUS [REPS]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench
from ner_spark.session import get_spark


def main() -> None:
    cpus = int(sys.argv[1])
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    conf = {**bench._PROBE_CONF, "spark.ui.enabled": "true"}
    spark = get_spark(
        f"diag_{cpus}", cpus=cpus, shuffle_partitions=max(cpus, 8), extra_conf=conf
    )
    path = bench._materialize_files(spark, bench.SCALE_FILES)
    bench._warm(spark)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        bench._noop(bench._kg_job(spark, path))
        times.append(round(time.perf_counter() - t0, 2))

    ui = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    )
    out = []
    for s in stages:
        out.append(
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:60],
                "tasks": s["numCompleteTasks"],
                "runTime_s": round(s["executorRunTime"] / 1000, 1),
                "cpuTime_s": round(s["executorCpuTime"] / 1e9, 1),
                "gc_s": round(s["jvmGcTime"] / 1000, 1),
                "deserialize_s": round(s["executorDeserializeTime"] / 1000, 1),
                "shuffle_write_s": round(s["shuffleWriteTime"] / 1e9, 1),
                "input_gb": round(s["inputBytes"] / 1e9, 2),
            }
        )
    print(json.dumps({"cpus": cpus, "walls": times, "stages": out}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
