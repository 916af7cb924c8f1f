"""Spark event-log performance analyzer (ops tool, offline).

Re-implements the diagnostic surface of the reference's
``src/analyze_spark_eventlog.py`` (1,170 LoC) as a compact pure-Python
module. Same health model and numeric verdict bands
(``analyze_spark_eventlog.py:408-492,605-774,896-974``):

- **Task skew** per stage: ``max(duration) / median(duration)`` — flag
  when > 3× (``:416``).
- **GC overhead**: ``jvmGcTime / executorRunTime`` — healthy < 5%
  (``:456-458``).
- **CPU efficiency**: ``executorCpuTime / executorRunTime`` — bands
  <50% low, 50-80% balanced, >80% cpu-bound (``:934-941``). One
  PySpark-specific extension over the reference: ``executorCpuTime``
  is a JVM counter and cannot see work done inside Python workers
  (mapInPandas / Pandas UDF stages would read as ~0% CPU while the
  Python side burns a full core), so the numerator also counts the
  ``time to run Python workers`` SQL metric from task accumulators.
- **Shuffle fetch-wait**: ``shuffleReadFetchWaitTime / executorRunTime``
  — bands 5% / 20% (``:959-965``).
- **Spill**: any ``memoryBytesSpilled``/``diskBytesSpilled`` is a
  finding — the target band is zero spill (``:681-684``).

Input: a Spark event-log file (JSON lines; the ``spark.eventLog.dir``
output). zstd-compressed logs are handled when the ``zstandard``
package is present; plain and ``.gz`` always work.

This is an offline driver tool — plain Python by design, like the
reference (SURVEY §2.1 S14): the event log is a few MB of JSON and
never worth a cluster roundtrip.
"""

from __future__ import annotations

import gzip
import json
import statistics
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Iterator

SKEW_RATIO_WARN = 3.0
GC_FRACTION_WARN = 0.05
CPU_EFF_LOW = 0.50
CPU_EFF_HIGH = 0.80
#: stages with at least this much TOTAL executor run time join the
#: app-level CPU-efficiency pool. Distinct from the per-stage
#: ``significant`` flag (max task >= 1 s), which exists for skew/GC
#: findings: a straggler gate selects exactly the pathological tail,
#: and at small scale factors that tail is ALL it selects — the verdict
#: would grade the app by its sickest stages while the healthy bulk
#: (many sub-second-task stages carrying most of the run time) goes
#: uncounted. A run-time-mass gate samples the workload instead.
CPU_VERDICT_MIN_RUN_MS = 2000
SHUFFLE_WAIT_WARN = 0.05
SHUFFLE_WAIT_CRITICAL = 0.20
#: executor-utilization bands (analyze_spark_eventlog.py:583-588):
#: >80% fully used, 50-80% adequate, 30-50% idle-heavy (fleet can
#: shrink), <30% over-provisioned.
UTIL_FULL = 0.80
UTIL_ADEQUATE = 0.50
UTIL_SHRINKABLE = 0.30
#: max-min utilization spread across executors, percentage points
#: (analyze_spark_eventlog.py:590-592): <10pp balanced, >20pp load
#: concentrated on few executors.
SPREAD_BALANCED_PP = 10.0
SPREAD_CONCENTRATED_PP = 20.0
#: peak execution memory / JVM heap bands
#: (analyze_spark_eventlog.py:718-731): >80% one data bump from
#: spilling, 50-80% healthy, <30% over-allocated.
MEM_RISKY = 0.80
MEM_HEALTHY = 0.50
MEM_OVERALLOCATED = 0.30


def read_event_lines(path: str | Path) -> Iterator[str]:
    p = Path(path)
    if p.is_dir():
        # Spark event-log v2 layout: a directory of rolled event files
        # (events_1_<app>, events_2_<app>, ...) plus an appstatus marker.
        parts = sorted(
            (f for f in p.iterdir() if f.name.startswith("events_")),
            key=lambda f: int(f.name.split("_")[1]),
        )
        for part in parts:
            yield from read_event_lines(part)
        return
    if p.suffix == ".gz":
        with gzip.open(p, "rt") as f:
            yield from f
    elif p.suffix in (".zst", ".zstd"):
        try:
            import zstandard  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise ImportError("zstd event logs need the 'zstandard' package") from e
        with open(p, "rb") as f:
            reader = zstandard.ZstdDecompressor().stream_reader(f)
            buf = b""
            while chunk := reader.read(1 << 20):
                buf += chunk
                while (nl := buf.find(b"\n")) >= 0:
                    yield buf[: nl + 1].decode()
                    buf = buf[nl + 1 :]
            if buf:
                yield buf.decode()
    else:
        with open(p) as f:
            yield from f


def parse_events(path: str | Path) -> Iterator[dict[str, Any]]:
    for line in read_event_lines(path):
        line = line.strip()
        if line:
            yield json.loads(line)


@dataclass
class TaskRecord:
    stage_id: int
    duration_ms: float
    run_time_ms: float
    cpu_time_ms: float
    python_time_ms: float
    gc_time_ms: float
    fetch_wait_ms: float
    shuffle_read_bytes: int
    shuffle_write_bytes: int
    mem_spill_bytes: int
    disk_spill_bytes: int
    input_bytes: int
    output_bytes: int


@dataclass
class StageStats:
    stage_id: int
    name: str = ""
    #: the submitting job's ``spark.job.description`` (set via
    #: ``sc.setJobDescription``) — lets findings name the CALLER'S case
    #: (e.g. a bench tier) instead of an opaque codegen stage name
    description: str = ""
    n_tasks: int = 0
    total_duration_ms: float = 0.0
    max_duration_ms: float = 0.0
    median_duration_ms: float = 0.0
    skew_ratio: float = 0.0
    gc_fraction: float = 0.0
    cpu_efficiency: float = 0.0
    python_time_ms: float = 0.0
    run_time_ms: float = 0.0
    shuffle_wait_fraction: float = 0.0
    shuffle_read_bytes: int = 0
    shuffle_write_bytes: int = 0
    mem_spill_bytes: int = 0
    disk_spill_bytes: int = 0
    input_bytes: int = 0
    output_bytes: int = 0
    significant: bool = False
    submission_ts: int = 0
    findings: list[str] = field(default_factory=list)


def _python_time_ms(info: dict[str, Any]) -> float:
    """Per-task 'time to run Python workers' SQL-metric update (ms).
    Present only on stages executing a Python eval node; 0 elsewhere."""
    total = 0.0
    for acc in info.get("Accumulables", []):
        if acc.get("Name") == "time to run Python workers":
            try:
                total += float(acc.get("Update", 0))
            except (TypeError, ValueError):
                pass
    return total


def _task_record(ev: dict[str, Any]) -> TaskRecord | None:
    info = ev.get("Task Info") or {}
    metrics = ev.get("Task Metrics") or {}
    if not metrics or info.get("Failed"):
        return None
    sr = metrics.get("Shuffle Read Metrics") or {}
    sw = metrics.get("Shuffle Write Metrics") or {}
    return TaskRecord(
        stage_id=ev.get("Stage ID", -1),
        duration_ms=(info.get("Finish Time", 0) - info.get("Launch Time", 0)),
        run_time_ms=metrics.get("Executor Run Time", 0),
        cpu_time_ms=metrics.get("Executor CPU Time", 0) / 1e6,  # ns → ms
        python_time_ms=_python_time_ms(info),
        gc_time_ms=metrics.get("JVM GC Time", 0),
        fetch_wait_ms=sr.get("Fetch Wait Time", 0),
        shuffle_read_bytes=sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0),
        shuffle_write_bytes=sw.get("Shuffle Bytes Written", 0),
        mem_spill_bytes=metrics.get("Memory Bytes Spilled", 0),
        disk_spill_bytes=metrics.get("Disk Bytes Spilled", 0),
        input_bytes=(metrics.get("Input Metrics") or {}).get("Bytes Read", 0),
        output_bytes=(metrics.get("Output Metrics") or {}).get("Bytes Written", 0),
    )


def analyze_stages(events: Iterator[dict[str, Any]]) -> list[StageStats]:
    tasks: dict[int, list[TaskRecord]] = {}
    names: dict[int, str] = {}
    submitted: dict[int, int] = {}
    descriptions: dict[int, str] = {}
    for ev in events:
        kind = ev.get("Event")
        if kind == "SparkListenerTaskEnd":
            rec = _task_record(ev)
            if rec is not None:
                tasks.setdefault(rec.stage_id, []).append(rec)
        elif kind == "SparkListenerStageCompleted":
            si = ev.get("Stage Info") or {}
            names[si.get("Stage ID", -1)] = si.get("Stage Name", "")
            submitted[si.get("Stage ID", -1)] = si.get("Submission Time", 0)
        elif kind == "SparkListenerJobStart":
            desc = (ev.get("Properties") or {}).get("spark.job.description", "")
            if desc:
                for si in ev.get("Stage Infos") or []:
                    descriptions[si.get("Stage ID", -1)] = desc

    out: list[StageStats] = []
    for stage_id in sorted(tasks):
        recs = tasks[stage_id]
        durations = [r.duration_ms for r in recs]
        run_time = sum(r.run_time_ms for r in recs) or 1.0
        st = StageStats(
            stage_id=stage_id,
            name=names.get(stage_id, ""),
            description=descriptions.get(stage_id, ""),
            submission_ts=submitted.get(stage_id, 0),
            n_tasks=len(recs),
            total_duration_ms=sum(durations),
            max_duration_ms=max(durations),
            median_duration_ms=statistics.median(durations),
            gc_fraction=sum(r.gc_time_ms for r in recs) / run_time,
            # busy fraction: JVM CPU plus Python-worker run time — the
            # JVM thread shows ~zero CPU while it blocks on the Python
            # pipe, so pure-JVM cpu/run misreads every Pandas-UDF stage
            # as idle.
            cpu_efficiency=sum(r.cpu_time_ms + r.python_time_ms for r in recs) / run_time,
            python_time_ms=sum(r.python_time_ms for r in recs),
            run_time_ms=run_time,
            shuffle_wait_fraction=sum(r.fetch_wait_ms for r in recs) / run_time,
            shuffle_read_bytes=sum(r.shuffle_read_bytes for r in recs),
            shuffle_write_bytes=sum(r.shuffle_write_bytes for r in recs),
            mem_spill_bytes=sum(r.mem_spill_bytes for r in recs),
            disk_spill_bytes=sum(r.disk_spill_bytes for r in recs),
            input_bytes=sum(r.input_bytes for r in recs),
            output_bytes=sum(r.output_bytes for r in recs),
        )
        st.skew_ratio = (
            st.max_duration_ms / st.median_duration_ms if st.median_duration_ms > 0 else 0.0
        )
        # any spill is a finding regardless of stage size (zero-spill band)
        if st.mem_spill_bytes or st.disk_spill_bytes:
            st.findings.append(
                f"spill: mem={st.mem_spill_bytes} disk={st.disk_spill_bytes} "
                "— target is zero; raise partitions or executor memory"
            )
        # significance gate for ratio metrics, as in the reference: skew
        # on sub-second stages is noise (analyze_spark_eventlog.py:475),
        # and GC/wait ratios over near-zero run time are meaningless
        st.significant = st.max_duration_ms >= 1000 and run_time >= 1000
        if st.significant:
            if st.n_tasks >= 4 and st.skew_ratio > SKEW_RATIO_WARN:
                st.findings.append(
                    f"task skew {st.skew_ratio:.1f}x > {SKEW_RATIO_WARN}x — "
                    "consider salting / AQE skew-join"
                )
            if st.gc_fraction > GC_FRACTION_WARN:
                st.findings.append(
                    f"GC {st.gc_fraction:.1%} > {GC_FRACTION_WARN:.0%} — memory pressure"
                )
            if st.shuffle_wait_fraction > SHUFFLE_WAIT_CRITICAL:
                st.findings.append(
                    f"shuffle fetch wait {st.shuffle_wait_fraction:.1%} critical (> "
                    f"{SHUFFLE_WAIT_CRITICAL:.0%})"
                )
            elif st.shuffle_wait_fraction > SHUFFLE_WAIT_WARN:
                st.findings.append(
                    f"shuffle fetch wait {st.shuffle_wait_fraction:.1%} elevated"
                )
        out.append(st)
    return out


def utilization_verdict(u: float) -> str:
    if u > UTIL_FULL:
        return "fully-utilized"
    if u >= UTIL_ADEQUATE:
        return "adequate"
    if u >= UTIL_SHRINKABLE:
        return "shrinkable"
    return "over-provisioned"


def spread_verdict(pp: float) -> str:
    if pp < SPREAD_BALANCED_PP:
        return "balanced"
    if pp <= SPREAD_CONCENTRATED_PP:
        return "uneven"
    return "concentrated"


def mem_verdict(frac: float, disk_spill: int) -> str:
    if disk_spill > 0:
        return "spilling"  # definite shortage regardless of peak ratio
    if frac > MEM_RISKY:
        return "risky"
    if frac >= MEM_HEALTHY:
        return "healthy"
    if frac >= MEM_OVERALLOCATED:
        return "adequate"
    return "over-allocated"


def analyze_executors(
    events: list[dict[str, Any]], stage_ids: set[int] | None = None
) -> dict[str, Any]:
    """Fleet-sizing report (the reference's sections 5–6,
    ``analyze_spark_eventlog.py:500-604`` executor utilization + load
    spread, ``:605-781`` peak-execution-memory vs JVM heap): the three
    numbers that answer "is the fleet the right SIZE", which the
    per-stage plan findings can't — a perfectly-planned query on a 2×
    oversized fleet shows clean stages and 40% utilization.

    - **utilization** per executor: Σ task wall duration / (span ×
      cores); the app-level number is the core-weighted mean. Band
      50–80% adequate (above: no headroom, below: shrink the fleet).
    - **load_spread_pp**: max−min executor utilization in percentage
      points; <10pp balanced. Wide spread with healthy per-stage skew
      means placement/locality trouble, not key skew.
    - **peak_mem_fraction**: max task Peak Execution Memory / JVM heap
      (BlockManagerAdded Maximum Memory), averaged over executors.
      50–80% healthy; >80% one data bump from spilling; <30% the heap
      is over-allocated.

    ``stage_ids`` restricts tasks to a phase window (bench grades each
    phase separately); the span is then the window's own task
    min-launch → max-finish, so utilization stays phase-local.
    In local[N] mode the single "driver" executor reports N cores —
    the bands read the same as on a real fleet.
    """
    execs: dict[str, dict[str, Any]] = {}
    heap: dict[str, int] = {}
    for ev in events:
        kind = ev.get("Event")
        if kind == "SparkListenerExecutorAdded":
            eid = str(ev.get("Executor ID", ""))
            info = ev.get("Executor Info") or {}
            execs[eid] = {
                "cores": info.get("Total Cores", 0) or 1,
                "added": ev.get("Timestamp", 0),
            }
        elif kind == "SparkListenerBlockManagerAdded":
            eid = str((ev.get("Block Manager ID") or {}).get("Executor ID", ""))
            heap[eid] = ev.get("Maximum Memory", 0)

    busy: dict[str, float] = {}
    peak: dict[str, int] = {}
    disk_spill: dict[str, int] = {}
    t_min: float | None = None
    t_max: float | None = None
    for ev in events:
        if ev.get("Event") != "SparkListenerTaskEnd":
            continue
        if stage_ids is not None and ev.get("Stage ID") not in stage_ids:
            continue
        info = ev.get("Task Info") or {}
        metrics = ev.get("Task Metrics") or {}
        if not metrics or info.get("Failed"):
            continue
        eid = str(info.get("Executor ID", ""))
        launch, finish = info.get("Launch Time", 0), info.get("Finish Time", 0)
        busy[eid] = busy.get(eid, 0.0) + max(0, finish - launch)
        peak[eid] = max(peak.get(eid, 0), metrics.get("Peak Execution Memory", 0))
        disk_spill[eid] = disk_spill.get(eid, 0) + metrics.get(
            "Disk Bytes Spilled", 0
        )
        t_min = launch if t_min is None else min(t_min, launch)
        t_max = finish if t_max is None else max(t_max, finish)

    if not busy or t_min is None or t_max is None or t_max <= t_min:
        return {
            "executor_utilization": None,
            "utilization_verdict": "no-tasks",
            "load_spread_pp": None,
            "load_spread_verdict": "no-tasks",
            "peak_mem_fraction": None,
            "peak_mem_fraction_max": None,
            "mem_verdict": "no-tasks",
            "executors": [],
        }
    span = t_max - t_min
    rows = []
    utils = []
    fracs = []
    total_cores = 0
    for eid in sorted(busy):
        cores = execs.get(eid, {}).get("cores", 1) or 1
        total_cores += cores
        u = busy[eid] / (span * cores)
        h = heap.get(eid, 0)
        frac = (peak.get(eid, 0) / h) if h > 0 else None
        utils.append((u, cores))
        if frac is not None:
            fracs.append(frac)
        rows.append({
            "executor": eid,
            "cores": cores,
            "busy_ms": round(busy[eid], 1),
            "utilization": round(u, 4),
            "heap_bytes": h,
            "peak_exec_bytes": peak.get(eid, 0),
            "peak_mem_fraction": round(frac, 4) if frac is not None else None,
            "disk_spill_bytes": disk_spill.get(eid, 0),
        })
    avg_util = sum(u * c for u, c in utils) / max(1, total_cores)
    spread_pp = (max(u for u, _ in utils) - min(u for u, _ in utils)) * 100
    avg_frac = (sum(fracs) / len(fracs)) if fracs else None
    total_disk_spill = sum(disk_spill.values())
    return {
        "executor_utilization": round(avg_util, 4),
        "utilization_verdict": utilization_verdict(avg_util),
        "load_spread_pp": round(spread_pp, 1),
        "load_spread_verdict": spread_verdict(spread_pp)
        if len(utils) > 1
        else "single-executor",
        "peak_mem_fraction": round(avg_frac, 4) if avg_frac is not None else None,
        "peak_mem_fraction_max": round(max(fracs), 4) if fracs else None,
        "mem_verdict": mem_verdict(avg_frac, total_disk_spill)
        if avg_frac is not None
        else "no-heap-info",
        "executors": rows,
    }


def cpu_verdict(efficiency: float) -> str:
    if efficiency < CPU_EFF_LOW:
        return "io-or-shuffle-bound"
    if efficiency <= CPU_EFF_HIGH:
        return "balanced"
    return "cpu-bound"


def analyze_pools(events: list[dict[str, Any]]) -> dict[str, Any]:
    """FAIR-scheduler pool assignment census (the reference's section 1,
    ``analyze_spark_eventlog.py:95-137``): jobs per scheduler pool. In a
    multi-topic streaming app every topic should run in its own pool;
    everything landing in ``default`` means ``setLocalProperty`` did not
    propagate into ``foreachBatch`` and one heavy topic can starve the
    rest."""
    pools: dict[str, int] = {}
    for ev in events:
        if ev.get("Event") != "SparkListenerJobStart":
            continue
        pool = (ev.get("Properties") or {}).get("spark.scheduler.pool", "default")
        pools[pool] = pools.get(pool, 0) + 1
    return {
        "pools": dict(sorted(pools.items(), key=lambda kv: -kv[1])),
        "n_jobs": sum(pools.values()),
        "fair_scheduling_active": len(pools) > 1,
    }


def analyze_group_timeline(events: list[dict[str, Any]]) -> dict[str, Any]:
    """Per-job-group wall-clock timeline (the reference's topic
    timeline, ``analyze_spark_eventlog.py:144-257``): groups are keyed
    by ``spark.jobGroup.id`` and labeled with the first line of
    ``spark.job.description`` — in a multi-topic run each topic's
    foreachBatch is one group. Reports per-group start/end/duration/job
    count and the peak number of concurrently-active groups (computed
    with an endpoint sweep, not per-second sampling — O(n log n) at any
    app length). Peak concurrency below the configured semaphore width
    means topics are serializing on something else."""
    group_label: dict[str, str] = {}
    job_start: dict[int, int] = {}
    job_end: dict[int, int] = {}
    job_group: dict[int, str] = {}
    for ev in events:
        kind = ev.get("Event")
        if kind == "SparkListenerJobStart":
            jid = int(ev["Job ID"])
            props = ev.get("Properties") or {}
            gid = props.get("spark.jobGroup.id", "")
            desc = (props.get("spark.job.description") or "").split("\n")[0].strip()
            if gid and desc and gid not in group_label:
                group_label[gid] = desc
            job_start[jid] = ev.get("Submission Time", 0)
            job_group[jid] = gid
        elif kind == "SparkListenerJobEnd":
            job_end[int(ev["Job ID"])] = ev.get("Completion Time", 0)
    by_group: dict[str, list[int]] = {}
    for jid, gid in job_group.items():
        if gid in group_label:
            by_group.setdefault(gid, []).append(jid)
    groups = []
    for gid, jids in by_group.items():
        starts = [job_start[j] for j in jids if j in job_start]
        ends = [job_end[j] for j in jids if j in job_end]
        if not starts or not ends:
            continue
        groups.append({
            "group": group_label[gid],
            "start_ms": min(starts),
            "end_ms": max(ends),
            "duration_ms": max(ends) - min(starts),
            "n_jobs": len(jids),
        })
    groups.sort(key=lambda g: g["start_ms"])
    # endpoint sweep for peak concurrency
    points = sorted(
        [(g["start_ms"], 1) for g in groups] + [(g["end_ms"], -1) for g in groups]
    )
    peak = cur = 0
    for _, delta in points:
        cur += delta
        peak = max(peak, cur)
    return {"groups": groups, "max_concurrent_groups": peak}


_SQL_TYPE_PATTERNS = [
    ("merge into", "MERGE INTO"),
    ("delete from", "DELETE"),
    ("insert into", "INSERT INTO"),
    ("create table", "DDL"),
    ("create database", "DDL"),
    ("select", "SELECT"),
]


def analyze_sql(events: list[dict[str, Any]], top_n: int = 10) -> dict[str, Any]:
    """SQL-execution latency census (the reference's section 3,
    ``analyze_spark_eventlog.py:258-371``): pair
    ``SparkListenerSQLExecutionStart/End`` events, bucket by statement
    type, and report count/avg/p50/p95/max/total per type plus the
    top-N slowest individual executions — the first place a
    MERGE-heavy CDC app shows which statement family eats the run."""
    starts: dict[int, dict[str, Any]] = {}
    ends: dict[int, int] = {}
    for ev in events:
        kind = ev.get("Event") or ""
        if kind.endswith("SparkListenerSQLExecutionStart"):
            starts[int(ev["executionId"])] = {
                "description": ev.get("description", "") or "",
                "time": ev.get("time", 0),
            }
        elif kind.endswith("SparkListenerSQLExecutionEnd"):
            ends[int(ev["executionId"])] = ev.get("time", 0)
    rows = []
    for eid, info in starts.items():
        if eid not in ends:
            continue
        low = info["description"].lower()
        sql_type = next(
            (t for pat, t in _SQL_TYPE_PATTERNS if pat in low), "OTHER"
        )
        rows.append({
            "id": eid,
            "type": sql_type,
            "duration_ms": ends[eid] - info["time"],
            "description": info["description"][:120],
        })
    by_type: dict[str, list[int]] = {}
    for r in rows:
        by_type.setdefault(r["type"], []).append(r["duration_ms"])
    stats = {}
    for t, ds in sorted(by_type.items(), key=lambda kv: -sum(kv[1])):
        ds = sorted(ds)
        n = len(ds)
        stats[t] = {
            "count": n,
            "avg_ms": round(sum(ds) / n, 1),
            "p50_ms": ds[n // 2],
            "p95_ms": ds[min(n - 1, int(n * 0.95))],
            "max_ms": ds[-1],
            "total_ms": sum(ds),
        }
    slowest = sorted(rows, key=lambda r: -r["duration_ms"])[:top_n]
    return {"sql_types": stats, "slowest": slowest}


def analyze_streaming_progress(events: list[dict[str, Any]]) -> dict[str, Any]:
    """Streaming-query progress census (the reference's section 8,
    ``analyze_spark_eventlog.py:1002-1077``): started/terminated query
    counts with failure reasons, batch progress rows (input rows +
    rates), and the avg-batches-per-query number that distinguishes an
    availableNow drain from a long-running trigger."""
    queries: dict[str, dict[str, Any]] = {}
    progress: list[dict[str, Any]] = []
    for ev in events:
        kind = ev.get("Event") or ""
        if "QueryStartedEvent" in kind:
            queries[ev.get("runId", "")] = {
                "name": ev.get("name", ""),
                "exception": None,
            }
        elif "QueryTerminatedEvent" in kind:
            rid = ev.get("runId", "")
            if rid in queries:
                queries[rid]["exception"] = ev.get("exception")
        elif "QueryProgressEvent" in kind:
            p = ev.get("progress") or {}
            progress.append({
                "name": p.get("name", ""),
                "batch_id": p.get("batchId"),
                "input_rows": p.get("numInputRows", 0),
                "input_rows_per_s": p.get("inputRowsPerSecond", 0),
                "processed_rows_per_s": p.get("processedRowsPerSecond", 0),
            })
    failed = [
        {"name": q["name"], "exception": (q["exception"] or "")[:200]}
        for q in queries.values()
        if q["exception"] is not None
    ]
    return {
        "n_queries": len(queries),
        "n_failed": len(failed),
        "failed": failed,
        "n_progress_batches": len(progress),
        "avg_batches_per_query": round(len(progress) / len(queries), 2)
        if queries
        else 0.0,
        "batches": progress,
    }


def analyze_eventlog(
    path: str | Path,
    until_epoch_ms: int | None = None,
    events: list[dict[str, Any]] | None = None,
    since_epoch_ms: int | None = None,
) -> dict[str, Any]:
    """Full-application report: per-stage stats + app-level verdicts.

    ``since_epoch_ms`` / ``until_epoch_ms`` restrict the report to
    stages SUBMITTED inside that epoch-ms window — callers that run
    distinct phases in one session (e.g. the bench's query phase vs its
    small-file DML stress phase vs its realistic-fill DML phase) can
    grade each phase against the health bands separately instead of
    blending them into one misleading number. Pass pre-parsed
    ``events`` to analyze several phase windows without re-reading the
    log."""
    if events is None:
        events = list(parse_events(path))
    stages = analyze_stages(iter(events))
    if until_epoch_ms is not None:
        stages = [s for s in stages if 0 < s.submission_ts <= until_epoch_ms]
    if since_epoch_ms is not None:
        stages = [s for s in stages if s.submission_ts > since_epoch_ms]
    app = {"app_name": None, "duration_ms": None, "executors": 0}
    start_ts = end_ts = None
    for ev in events:
        if ev.get("Event") == "SparkListenerApplicationStart":
            app["app_name"] = ev.get("App Name")
            start_ts = ev.get("Timestamp")
        elif ev.get("Event") == "SparkListenerApplicationEnd":
            end_ts = ev.get("Timestamp")
        elif ev.get("Event") == "SparkListenerExecutorAdded":
            app["executors"] += 1
    if start_ts is not None and end_ts is not None:
        app["duration_ms"] = end_ts - start_ts

    # App-level CPU verdict from stages with enough RUN-TIME MASS
    # (CPU_VERDICT_MIN_RUN_MS — see comment there), with per-stage
    # ratios clamped to 1.0: on sub-ms tasks "Executor Run Time" rounds
    # down to whole ms while CPU time keeps ns precision, so tiny stages
    # report cpu/run > 1 — physically meaningless and, summed over many
    # short DML stages, enough to push the app ratio past 1. Stages are
    # weighted by executor RUN time (time actually spent executing, the
    # same denominator as the per-stage ratio), not wall task duration,
    # which also counts scheduler/queue delay.
    sig_stages = [s for s in stages if s.run_time_ms >= CPU_VERDICT_MIN_RUN_MS] or stages
    total_run = sum(s.run_time_ms for s in sig_stages) or 1.0
    weighted_cpu = (
        sum(min(1.0, s.cpu_efficiency) * s.run_time_ms for s in sig_stages)
        / total_run
    )
    total_py = sum(s.python_time_ms for s in stages)
    windowed = since_epoch_ms is not None or until_epoch_ms is not None
    fleet = analyze_executors(
        events, stage_ids={s.stage_id for s in stages} if windowed else None
    )
    report = {
        "app": app,
        "n_stages": len(stages),
        "executor_utilization": fleet["executor_utilization"],
        "utilization_verdict": fleet["utilization_verdict"],
        "load_spread_pp": fleet["load_spread_pp"],
        "load_spread_verdict": fleet["load_spread_verdict"],
        "peak_mem_fraction": fleet["peak_mem_fraction"],
        "peak_mem_fraction_max": fleet["peak_mem_fraction_max"],
        "mem_verdict": fleet["mem_verdict"],
        "executors_detail": fleet["executors"],
        "cpu_efficiency": round(weighted_cpu, 4),
        "cpu_verdict": cpu_verdict(weighted_cpu),
        "python_time_ms": round(total_py, 1),
        "total_spill_bytes": sum(s.mem_spill_bytes + s.disk_spill_bytes for s in stages),
        "max_skew_ratio": round(
            max((s.skew_ratio for s in stages if s.significant), default=0.0), 2
        ),
        "findings": [
            {
                "stage_id": s.stage_id,
                "name": s.name[:80],
                "case": s.description[:80],
                "findings": s.findings,
            }
            for s in stages
            if s.findings
        ],
        "stages": stages,
    }
    return report


def main(argv: list[str] | None = None) -> int:
    """CLI: ``python -m datalake_iceberg_spark.ops.eventlog <log-path>``
    — prints the report as JSON (the reference ships the analyzer as a
    standalone CLI too, ``src/analyze_spark_eventlog.py``)."""
    import argparse
    import dataclasses
    import json as _json
    import sys

    ap = argparse.ArgumentParser(description="Spark event-log health analyzer")
    ap.add_argument("path", help="event-log file or v2 rolling directory")
    ap.add_argument("--stages", action="store_true", help="include per-stage rows")
    ap.add_argument(
        "--timeline", action="store_true",
        help="include pool / job-group / SQL-type / streaming sections",
    )
    ns = ap.parse_args(argv)
    events = list(parse_events(ns.path))
    report = analyze_eventlog(ns.path, events=events)
    if ns.stages:
        report["stages"] = [dataclasses.asdict(s) for s in report["stages"]]
    else:
        report.pop("stages")
    if ns.timeline:
        report["pools"] = analyze_pools(events)
        report["group_timeline"] = analyze_group_timeline(events)
        report["sql"] = analyze_sql(events)
        report["streaming"] = analyze_streaming_progress(events)
    _json.dump(report, sys.stdout, indent=2, default=str)
    print()
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
