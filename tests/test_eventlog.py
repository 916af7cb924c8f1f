"""Event-log analyzer: synthetic-log unit checks + a real log produced
by a subprocess Spark app with eventLog enabled."""

import json
import subprocess
import sys

import pytest

from datalake_iceberg_spark.ops import eventlog as el


def _task_end(stage, dur, run, cpu_ms, gc=0, wait=0, mem_spill=0, disk_spill=0):
    return {
        "Event": "SparkListenerTaskEnd",
        "Stage ID": stage,
        "Task Info": {"Launch Time": 1000, "Finish Time": 1000 + dur, "Failed": False},
        "Task Metrics": {
            "Executor Run Time": run,
            "Executor CPU Time": cpu_ms * 1e6,  # ns
            "JVM GC Time": gc,
            "Memory Bytes Spilled": mem_spill,
            "Disk Bytes Spilled": disk_spill,
            "Shuffle Read Metrics": {
                "Fetch Wait Time": wait,
                "Remote Bytes Read": 10,
                "Local Bytes Read": 5,
            },
            "Shuffle Write Metrics": {"Shuffle Bytes Written": 20},
            "Input Metrics": {"Bytes Read": 100},
            "Output Metrics": {"Bytes Written": 0},
        },
    }


def _write_log(path, events):
    with open(path, "w") as f:
        for ev in events:
            f.write(json.dumps(ev) + "\n")


def test_skew_and_gc_findings(tmp_path):
    events = (
        [{"Event": "SparkListenerApplicationStart", "App Name": "t", "Timestamp": 0}]
        + [_task_end(1, 100, 100, 90) for _ in range(7)]
        + [_task_end(1, 1000, 1000, 900, gc=200)]  # straggler + heavy GC
        + [
            {
                "Event": "SparkListenerStageCompleted",
                "Stage Info": {"Stage ID": 1, "Stage Name": "shuffle at q1"},
            },
            {"Event": "SparkListenerApplicationEnd", "Timestamp": 5000},
        ]
    )
    log = tmp_path / "app.log"
    _write_log(log, events)
    report = el.analyze_eventlog(log)
    assert report["app"]["app_name"] == "t" and report["app"]["duration_ms"] == 5000
    (stage,) = report["stages"]
    assert stage.n_tasks == 8
    assert stage.skew_ratio == 10.0
    joined = " ".join(stage.findings)
    assert "task skew" in joined and "GC" in joined


def test_spill_and_wait_findings(tmp_path):
    events = [
        _task_end(2, 2000, 2000, 1000, wait=600, mem_spill=1024),
        _task_end(2, 2000, 2000, 1000, wait=600, disk_spill=2048),
    ]
    log = tmp_path / "app2.log"
    _write_log(log, events)
    report = el.analyze_eventlog(log)
    (stage,) = report["stages"]
    joined = " ".join(stage.findings)
    assert "spill" in joined and "critical" in joined
    assert report["total_spill_bytes"] == 3072


def test_cpu_verdict_bands():
    assert el.cpu_verdict(0.3) == "io-or-shuffle-bound"
    assert el.cpu_verdict(0.6) == "balanced"
    assert el.cpu_verdict(0.95) == "cpu-bound"


def test_failed_tasks_excluded(tmp_path):
    bad = _task_end(3, 50, 50, 40)
    bad["Task Info"]["Failed"] = True
    log = tmp_path / "app3.log"
    _write_log(log, [bad, _task_end(3, 60, 60, 40)])
    report = el.analyze_eventlog(log)
    assert report["stages"][0].n_tasks == 1


_SUBPROC = r"""
import glob, sys
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[2]")
  .appName("eventlog-probe")
  .config("spark.eventLog.enabled", "true")
  .config("spark.eventLog.dir", sys.argv[1])
  .config("spark.eventLog.compress", "false")
  .config("spark.sql.shuffle.partitions", "4")
  .config("spark.ui.enabled", "false")
  .getOrCreate())
df = spark.read.parquet(sys.argv[2] + "/orders.parquet")
df.groupBy("o_custkey").count().orderBy(F.desc("count")).collect()
spark.stop()
"""


@pytest.mark.slow
def test_real_eventlog_roundtrip(tmp_path, sf_dir):
    log_dir = tmp_path / "evlogs"
    log_dir.mkdir()
    subprocess.run(
        [sys.executable, "-c", _SUBPROC, str(log_dir), sf_dir],
        check=True,
        capture_output=True,
        timeout=300,
    )
    logs = [p for p in log_dir.iterdir() if not p.name.endswith(".inprogress")]
    assert logs, "no event log produced"
    report = el.analyze_eventlog(logs[0])
    assert report["app"]["app_name"] == "eventlog-probe"
    assert report["n_stages"] >= 2  # scan+partial agg, final agg (+ sort)
    assert all(s.n_tasks >= 1 for s in report["stages"])
    assert report["cpu_verdict"] in ("io-or-shuffle-bound", "balanced", "cpu-bound")
    # fleet sections populate from a REAL local-mode log too: the single
    # "driver" executor reports its cores and heap
    assert 0 < report["executor_utilization"] <= 1.0
    assert report["load_spread_verdict"] == "single-executor"
    assert report["peak_mem_fraction"] is not None
    assert report["mem_verdict"] in (
        "spilling", "risky", "healthy", "adequate", "over-allocated"
    )


# --------------------- r6: fleet-sizing sections (utilization / memory)


def _exec_added(eid, cores, ts=0):
    return {
        "Event": "SparkListenerExecutorAdded",
        "Executor ID": eid,
        "Timestamp": ts,
        "Executor Info": {"Host": "h", "Total Cores": cores},
    }


def _bm_added(eid, max_mem):
    return {
        "Event": "SparkListenerBlockManagerAdded",
        "Block Manager ID": {"Executor ID": eid},
        "Maximum Memory": max_mem,
    }


def _task_on(stage, eid, launch, finish, peak=0, disk_spill=0):
    ev = _task_end(stage, finish - launch, finish - launch, 1,
                   disk_spill=disk_spill)
    ev["Task Info"]["Executor ID"] = eid
    ev["Task Info"]["Launch Time"] = launch
    ev["Task Info"]["Finish Time"] = finish
    ev["Task Metrics"]["Peak Execution Memory"] = peak
    return ev


def test_executor_utilization_and_load_spread():
    """One executor busy the whole span, one nearly idle: avg
    utilization lands mid-band and the spread flags concentration
    (analyze_spark_eventlog.py:583-592 bands)."""
    events = [
        _exec_added("1", 1), _exec_added("2", 1),
        _bm_added("1", 1000), _bm_added("2", 1000),
        _task_on(1, "1", 0, 1000, peak=600),
        _task_on(1, "2", 0, 100, peak=600),
    ]
    fleet = el.analyze_executors(events)
    assert fleet["executors"][0]["utilization"] == 1.0
    assert fleet["executors"][1]["utilization"] == 0.1
    assert fleet["executor_utilization"] == 0.55
    assert fleet["utilization_verdict"] == "adequate"
    assert fleet["load_spread_pp"] == 90.0
    assert fleet["load_spread_verdict"] == "concentrated"
    assert fleet["mem_verdict"] == "healthy"  # 0.6 avg peak fraction


def test_utilization_verdict_bands():
    assert el.utilization_verdict(0.9) == "fully-utilized"
    assert el.utilization_verdict(0.6) == "adequate"
    assert el.utilization_verdict(0.4) == "shrinkable"
    assert el.utilization_verdict(0.1) == "over-provisioned"
    assert el.spread_verdict(5) == "balanced"
    assert el.spread_verdict(15) == "uneven"
    assert el.spread_verdict(30) == "concentrated"


def test_peak_memory_bands_and_spill_override():
    base = [_exec_added("1", 4), _bm_added("1", 1000)]
    risky = el.analyze_executors(base + [_task_on(1, "1", 0, 100, peak=900)])
    assert risky["peak_mem_fraction"] == 0.9 and risky["mem_verdict"] == "risky"
    over = el.analyze_executors(base + [_task_on(1, "1", 0, 100, peak=100)])
    assert over["mem_verdict"] == "over-allocated"
    # any disk spill is a shortage verdict regardless of peak ratio
    sp = el.analyze_executors(
        base + [_task_on(1, "1", 0, 100, peak=100, disk_spill=5)]
    )
    assert sp["mem_verdict"] == "spilling"


def test_fleet_keys_in_report_and_phase_window(tmp_path):
    """analyze_eventlog surfaces the fleet keys; a phase window computes
    utilization from the window's own stages and span."""
    events = (
        [{"Event": "SparkListenerApplicationStart", "App Name": "t", "Timestamp": 0},
         _exec_added("1", 1), _bm_added("1", 1000),
         _task_on(1, "1", 0, 1000, peak=700),
         _task_on(2, "1", 2000, 2500, peak=700),
         {"Event": "SparkListenerStageCompleted",
          "Stage Info": {"Stage ID": 1, "Stage Name": "s1", "Submission Time": 1}},
         {"Event": "SparkListenerStageCompleted",
          "Stage Info": {"Stage ID": 2, "Stage Name": "s2", "Submission Time": 1900}},
         {"Event": "SparkListenerApplicationEnd", "Timestamp": 3000}]
    )
    log = tmp_path / "fleet.log"
    _write_log(log, events)
    full = el.analyze_eventlog(log)
    assert full["peak_mem_fraction"] == 0.7 and full["mem_verdict"] == "healthy"
    # full span 0..2500, busy 1500 -> 0.6
    assert full["executor_utilization"] == 0.6
    assert full["load_spread_verdict"] == "single-executor"
    # phase window: only stage 2 (submitted after 1000): busy 500 over
    # its own 500ms span -> fully utilized
    phase = el.analyze_eventlog(log, since_epoch_ms=1000)
    assert phase["executor_utilization"] == 1.0
    assert phase["utilization_verdict"] == "fully-utilized"


# ------------- r6: pool / group-timeline / SQL-type / streaming census


def test_pools_census():
    evs = [
        {"Event": "SparkListenerJobStart", "Job ID": i,
         "Properties": {"spark.scheduler.pool": pool}}
        for i, pool in enumerate(["t_orders", "t_orders", "t_events"])
    ] + [{"Event": "SparkListenerJobStart", "Job ID": 9, "Properties": {}}]
    rep = el.analyze_pools(evs)
    assert rep["pools"] == {"t_orders": 2, "t_events": 1, "default": 1}
    assert rep["n_jobs"] == 4 and rep["fair_scheduling_active"]
    assert not el.analyze_pools(evs[-1:])["fair_scheduling_active"]


def test_group_timeline_and_peak_concurrency():
    def job(jid, gid, desc, start, end):
        return [
            {"Event": "SparkListenerJobStart", "Job ID": jid,
             "Submission Time": start,
             "Properties": {"spark.jobGroup.id": gid,
                            "spark.job.description": desc}},
            {"Event": "SparkListenerJobEnd", "Job ID": jid,
             "Completion Time": end},
        ]

    evs = (job(1, "g1", "topic.a", 0, 1000) + job(2, "g1", "topic.a", 500, 2000)
           + job(3, "g2", "topic.b", 800, 1500))
    rep = el.analyze_group_timeline(evs)
    groups = {g["group"]: g for g in rep["groups"]}
    assert groups["topic.a"]["start_ms"] == 0
    assert groups["topic.a"]["end_ms"] == 2000
    assert groups["topic.a"]["n_jobs"] == 2
    assert groups["topic.b"]["duration_ms"] == 700
    assert rep["max_concurrent_groups"] == 2


def test_sql_type_census_and_slowest():
    pre = "org.apache.spark.sql.execution.ui.SparkListener"
    evs = []
    for eid, (desc, dur) in enumerate([
        ("MERGE INTO t USING s", 500),
        ("merge into t2 using s2", 1500),
        ("SELECT * FROM t", 100),
        ("CREATE TABLE t (x int)", 50),
    ]):
        evs.append({"Event": pre + "SQLExecutionStart", "executionId": eid,
                    "description": desc, "time": 0})
        evs.append({"Event": pre + "SQLExecutionEnd", "executionId": eid,
                    "time": dur})
    # an unfinished execution must be ignored
    evs.append({"Event": pre + "SQLExecutionStart", "executionId": 99,
                "description": "SELECT hang", "time": 0})
    rep = el.analyze_sql(evs)
    assert rep["sql_types"]["MERGE INTO"]["count"] == 2
    assert rep["sql_types"]["MERGE INTO"]["total_ms"] == 2000
    assert rep["sql_types"]["SELECT"]["count"] == 1
    assert rep["sql_types"]["DDL"]["count"] == 1
    assert rep["slowest"][0]["duration_ms"] == 1500
    # ordered by total descending -> MERGE INTO first
    assert list(rep["sql_types"]) [0] == "MERGE INTO"


def test_streaming_progress_census():
    evs = [
        {"Event": "org.apache.spark.sql.streaming.StreamingQueryListener$QueryStartedEvent",
         "runId": "r1", "name": "q1"},
        {"Event": "org.apache.spark.sql.streaming.StreamingQueryListener$QueryProgressEvent",
         "progress": {"name": "q1", "batchId": 0, "numInputRows": 10,
                      "inputRowsPerSecond": 5.0, "processedRowsPerSecond": 9.0}},
        {"Event": "org.apache.spark.sql.streaming.StreamingQueryListener$QueryTerminatedEvent",
         "runId": "r1", "exception": None},
        {"Event": "org.apache.spark.sql.streaming.StreamingQueryListener$QueryStartedEvent",
         "runId": "r2", "name": "q2"},
        {"Event": "org.apache.spark.sql.streaming.StreamingQueryListener$QueryTerminatedEvent",
         "runId": "r2", "exception": "boom at stage 3"},
    ]
    rep = el.analyze_streaming_progress(evs)
    assert rep["n_queries"] == 2 and rep["n_failed"] == 1
    assert rep["failed"][0]["name"] == "q2"
    assert rep["n_progress_batches"] == 1
    assert rep["batches"][0]["input_rows"] == 10
