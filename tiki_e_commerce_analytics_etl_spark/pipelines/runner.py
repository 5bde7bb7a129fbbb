"""Minimal dependency-DAG task runner with Airflow-equivalent
operational semantics.

Reference behavior being re-expressed (semantics only — the reference
runs Apache Airflow 2.8.1):

- retries + retry_delay per task: `dags/tiki_dag.py:17-20`
  (``retries: 2, retry_delay: timedelta(minutes=5)``).
- linear/task dependencies: ``a >> b >> c`` chains in every DAG
  (`dags/trends_dag.py:687`, `dags/analytics_dag.py:355`).
- trigger_rule='all_success' gating downstream on upstream success:
  `dags/analytics_dag.py:336,347`.
- max_active_runs=1 (no two concurrent runs of one pipeline):
  `dags/tiki_dag.py:34`.
- per-logical-date (``ds``) task-instance state: a re-triggered Airflow
  run skips already-succeeded task instances; we persist per-``(pipeline,
  ds)`` state and resume the same way.
- XCom result passing between tasks (`dags/trends_dag.py:368,481`):
  each task's return value is published to ``ctx.xcom[task_name]``.

Intentionally NOT re-implemented: cron scheduling itself and email
alerting (`tiki_dag.py:14-16,31`) — process-level concerns outside an
execution engine; callers trigger ``Pipeline.run(ds=...)`` from
whatever scheduler they have.
"""

from __future__ import annotations

import json
import os
import threading
import time
import traceback
import uuid
from dataclasses import dataclass, field
from typing import Any, Callable

__all__ = ["Task", "Context", "TaskResult", "Pipeline", "PipelineLocked"]

# Terminal task states, mirroring Airflow's TaskInstance states.
SUCCESS = "success"
FAILED = "failed"
SKIPPED = "skipped"  # upstream failed and trigger_rule was all_success
RESUMED = "resumed"  # succeeded in a previous run of the same ds


class PipelineLocked(RuntimeError):
    """Another run of this pipeline is already active (max_active_runs=1)."""


@dataclass
class Task:
    name: str
    fn: Callable[["Context"], Any]
    upstream: tuple[str, ...] = ()
    retries: int = 0
    retry_delay: float = 0.0
    trigger_rule: str = "all_success"  # or "all_done"
    timeout: float | None = None  # seconds; execution_timeout analogue

    def __post_init__(self) -> None:
        if self.trigger_rule not in ("all_success", "all_done"):
            raise ValueError(f"unknown trigger_rule {self.trigger_rule!r}")


@dataclass
class Context:
    """Handed to every task: the logical date, shared session/params and
    the cross-task result store (XCom analogue)."""

    ds: str
    spark: Any = None
    params: dict[str, Any] = field(default_factory=dict)
    xcom: dict[str, Any] = field(default_factory=dict)


@dataclass
class TaskResult:
    state: str
    attempts: int = 0
    duration: float = 0.0
    error: str | None = None


class Pipeline:
    """A named DAG of :class:`Task` run in dependency order.

    ``state_dir`` (optional) enables per-``ds`` resume: task success is
    recorded to ``{state_dir}/{name}__{ds}.json`` after each task, and a
    re-run of the same logical date skips tasks that already succeeded
    (re-publishing their recorded XCom when it was JSON-serializable;
    tasks whose result was not serializable re-execute — they are
    required to be idempotent anyway, as all sink tasks here are).
    """

    def __init__(self, name: str, state_dir: str | None = None):
        self.name = name
        self.state_dir = state_dir
        self._tasks: dict[str, Task] = {}

    def add(self, task: Task) -> Task:
        if task.name in self._tasks:
            raise ValueError(f"duplicate task {task.name!r}")
        self._tasks[task.name] = task
        return task

    def task(
        self,
        name: str,
        upstream: tuple[str, ...] = (),
        **kw: Any,
    ) -> Callable[[Callable[[Context], Any]], Callable[[Context], Any]]:
        """Decorator form: ``@pipe.task("transform", upstream=("crawl",))``."""

        def deco(fn: Callable[[Context], Any]) -> Callable[[Context], Any]:
            self.add(Task(name=name, fn=fn, upstream=tuple(upstream), **kw))
            return fn

        return deco

    # -- graph ---------------------------------------------------------

    def topo_order(self) -> list[Task]:
        """Kahn's algorithm; raises on unknown upstream or a cycle."""
        indeg: dict[str, int] = {}
        downstream: dict[str, list[str]] = {n: [] for n in self._tasks}
        for t in self._tasks.values():
            indeg[t.name] = len(t.upstream)
            for up in t.upstream:
                if up not in self._tasks:
                    raise ValueError(f"task {t.name!r} depends on unknown {up!r}")
                downstream[up].append(t.name)
        # Deterministic order: insertion order among ready tasks.
        ready = [n for n in self._tasks if indeg[n] == 0]
        out: list[Task] = []
        while ready:
            n = ready.pop(0)
            out.append(self._tasks[n])
            for d in downstream[n]:
                indeg[d] -= 1
                if indeg[d] == 0:
                    ready.append(d)
        if len(out) != len(self._tasks):
            cyc = sorted(set(self._tasks) - {t.name for t in out})
            raise ValueError(f"cycle involving tasks {cyc}")
        return out

    # -- state sidecar -------------------------------------------------

    def _state_path(self, ds: str) -> str | None:
        if self.state_dir is None:
            return None
        safe_ds = ds.replace(os.sep, "_")
        return os.path.join(self.state_dir, f"{self.name}__{safe_ds}.json")

    def _load_state(self, ds: str) -> dict[str, dict]:
        p = self._state_path(ds)
        if p is None or not os.path.exists(p):
            return {}
        try:
            with open(p) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return {}

    def _save_state(self, ds: str, state: dict[str, dict]) -> None:
        p = self._state_path(ds)
        if p is None:
            return
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, p)  # atomic: a crashed save never corrupts state

    # -- locking (max_active_runs=1) -----------------------------------

    def _acquire_lock(self) -> str | None:
        if self.state_dir is None:
            return None
        os.makedirs(self.state_dir, exist_ok=True)
        lock = os.path.join(self.state_dir, f"{self.name}.lock")
        for _ in range(8):
            # Write the pid to a private file FIRST, then publish with
            # link(2): the lock is never observable empty (a crash
            # between create and write would otherwise leave a lock
            # parsing as pid 0 — and kill(0, 0) signals our own process
            # group, i.e. "alive" forever).
            tmp = f"{lock}.{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
            with open(tmp, "w") as f:
                f.write(str(os.getpid()))
            try:
                os.link(tmp, lock)
                return lock
            except FileExistsError:
                pass
            finally:
                os.unlink(tmp)
            # Lock exists: decide live vs stale.
            try:
                with open(lock) as f:
                    pid = int(f.read().strip())
            except (OSError, ValueError):
                pid = None  # vanished or corrupt → treat as stale
            if pid is not None and pid > 0:
                try:
                    os.kill(pid, 0)
                    raise PipelineLocked(f"{self.name}: run already active (pid {pid})")
                except ProcessLookupError:
                    pass  # dead → stale
                except PermissionError:
                    # The process EXISTS (owned by another user) — that
                    # is a live lock, not a stale one.
                    raise PipelineLocked(
                        f"{self.name}: run already active (pid {pid}, other user)"
                    )
            # Reap the stale lock via rename — atomic, so exactly ONE
            # contender wins the reap (unlink+recreate would let a loser
            # delete the winner's FRESH lock: the classic TOCTOU).
            reaped = f"{lock}.stale.{uuid.uuid4().hex[:8]}"
            try:
                os.rename(lock, reaped)
                os.unlink(reaped)
            except FileNotFoundError:
                pass  # another contender reaped it first; retry acquire
        raise PipelineLocked(f"{self.name}: could not acquire lock after retries")

    # -- execution -----------------------------------------------------

    def _call_with_timeout(self, task: Task, ctx: Context) -> Any:
        if task.timeout is None:
            return task.fn(ctx)
        box: dict[str, Any] = {}

        def target() -> None:
            try:
                box["value"] = task.fn(ctx)
            except BaseException as exc:  # noqa: BLE001 - reraised below
                box["error"] = exc

        th = threading.Thread(target=target, daemon=True)
        th.start()
        th.join(task.timeout)
        if th.is_alive():
            # Cannot kill a thread; abandon it (daemon) and fail the task
            # — same observable outcome as Airflow's execution_timeout.
            raise TimeoutError(f"{task.name}: exceeded timeout {task.timeout}s")
        if "error" in box:
            raise box["error"]
        return box.get("value")

    def run(
        self,
        ds: str,
        spark: Any = None,
        params: dict[str, Any] | None = None,
        sleep: Callable[[float], None] = time.sleep,
        max_workers: int = 1,
    ) -> dict[str, TaskResult]:
        """Execute the DAG for logical date ``ds``; returns per-task results.

        ``sleep`` is injectable so tests can assert retry delays without
        waiting for them.  ``max_workers > 1`` runs READY tasks (all
        upstreams terminal) concurrently on a thread pool — Spark
        schedules concurrently-submitted jobs fairly, so independent
        Spark-heavy tasks overlap their idle stages like Airflow's
        parallel task instances; state saves serialize on a lock.
        """
        order = self.topo_order()
        lock = self._acquire_lock()
        try:
            ctx = Context(ds=ds, spark=spark, params=dict(params or {}))
            state = self._load_state(ds)
            state_lock = threading.Lock()
            results: dict[str, TaskResult] = {}

            def record_success(name: str) -> None:
                entry: dict[str, Any] = {"state": SUCCESS}
                try:
                    entry["xcom"] = json.loads(json.dumps(ctx.xcom[name]))
                except (TypeError, ValueError):
                    pass  # unserializable result → re-execute on resume
                with state_lock:
                    state[name] = entry
                    self._save_state(ds, state)

            def pre_state(task: Task) -> str | None:
                """Terminal state decidable WITHOUT executing, else None."""
                prior = state.get(task.name)
                if prior is not None and prior.get("state") == SUCCESS and "xcom" in prior:
                    ctx.xcom[task.name] = prior["xcom"]
                    return RESUMED
                if task.trigger_rule == "all_success" and any(
                    results[u].state in (FAILED, SKIPPED) for u in task.upstream
                ):
                    return SKIPPED
                return None

            if max_workers <= 1:
                for task in order:
                    decided = pre_state(task)
                    if decided is not None:
                        results[task.name] = TaskResult(state=decided)
                        continue
                    results[task.name] = self._run_one(task, ctx, sleep)
                    if results[task.name].state == SUCCESS:
                        record_success(task.name)
                return results

            from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait

            remaining = {t.name: t for t in order}
            futures = {}
            with ThreadPoolExecutor(max_workers=max_workers) as pool:
                while remaining or futures:
                    for name in [n for n, t in remaining.items() if all(
                        u in results for u in t.upstream
                    )]:
                        task = remaining.pop(name)
                        decided = pre_state(task)
                        if decided is not None:
                            results[name] = TaskResult(state=decided)
                            continue
                        futures[pool.submit(self._run_one, task, ctx, sleep)] = name
                    if not futures:
                        continue  # newly-decided states may unblock more
                    done, _ = wait(futures, return_when=FIRST_COMPLETED)
                    for fut in done:
                        name = futures.pop(fut)
                        results[name] = fut.result()
                        if results[name].state == SUCCESS:
                            record_success(name)
            return results
        finally:
            if lock is not None:
                try:
                    os.unlink(lock)
                except OSError:
                    pass

    def backfill(
        self,
        dates: list[str],
        spark: Any = None,
        params: dict[str, Any] | None = None,
        sleep: Callable[[float], None] = time.sleep,
        max_workers: int = 1,
    ) -> dict[str, dict[str, TaskResult]]:
        """Run the DAG once per logical date, oldest first — the manual
        form of Airflow's catchup.  Dates whose state records every task
        succeeded resume instantly, so re-running a backfill after a
        partial failure only executes what's missing."""
        return {
            ds: self.run(ds, spark=spark, params=params, sleep=sleep, max_workers=max_workers)
            for ds in sorted(dates)
        }

    def _run_one(
        self, task: Task, ctx: Context, sleep: Callable[[float], None]
    ) -> TaskResult:
        res = TaskResult(state=FAILED)
        for attempt in range(task.retries + 1):
            res.attempts = attempt + 1
            start = time.perf_counter()
            try:
                value = self._call_with_timeout(task, ctx)
            except Exception:  # KeyboardInterrupt/SystemExit must ABORT
                # the run, not be recorded-and-retried (a Ctrl-C would
                # otherwise sleep retry_delay and rerun the task).
                res.duration += time.perf_counter() - start
                res.error = traceback.format_exc(limit=8)
                if attempt < task.retries:
                    sleep(task.retry_delay)
                continue
            res.duration += time.perf_counter() - start
            res.state = SUCCESS
            res.error = None
            ctx.xcom[task.name] = value
            break
        return res
