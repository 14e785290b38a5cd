"""Job runner: the orchestration-plane parity layer (SURVEY.md §2.1,
"orchestration-plane behaviors").

The reference runs its pipeline as an Airflow DAG
(``airflow/dags/etl_api.py:207``: clean_up >> init >> extract >> ingest >>
trigger_glue >> check_status) with per-task retries (1×/5 min, ``:68-69``),
failure callbacks (Slack ``:40-46``, email via airflow.cfg:1-8), XCom
parameter passing, and a 10 s Glue poll loop (``:189-196``).

In-process, the task graph collapses to ordered function calls sharing one
SparkSession: XCom → function arguments, the Glue poll boundary → a
synchronous action, callbacks → pluggable hooks. What remains worth keeping
is retry-with-backoff and failure hooks — implemented here without any
scheduler dependency. A production deployment can still wrap these stages in
Airflow/dbt/cron; the engine doesn't care.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

logger = logging.getLogger("ab_inbev_big_data_case_spark.runner")


@dataclass
class Stage:
    """One pipeline stage: a named callable taking and returning a context
    dict (the in-process replacement for XCom)."""

    name: str
    fn: Callable[[dict], dict]
    retries: int = 1            # reference default: 1 retry (etl_api.py:68)
    retry_delay_s: float = 0.0  # reference: 300 s; injectable for tests


@dataclass
class RunReport:
    succeeded: list[str] = field(default_factory=list)
    failed: str | None = None
    attempts: dict[str, int] = field(default_factory=dict)


def run_stages(
    stages: Sequence[Stage],
    context: dict | None = None,
    on_failure: Callable[[str, Exception], None] | None = None,
) -> tuple[dict, RunReport]:
    """Run stages in order (the reference's ``>>`` chain), retrying each per
    its policy; on exhaustion fire the failure hook (Slack/email stand-in)
    and re-raise — failing the run like a failed Airflow task fails the DAG.
    """
    ctx = dict(context or {})
    report = RunReport()
    for stage in stages:
        attempt = 0
        while True:
            attempt += 1
            report.attempts[stage.name] = attempt
            try:
                logger.info("stage %s: attempt %d", stage.name, attempt)
                ctx = stage.fn(ctx)
                report.succeeded.append(stage.name)
                break
            except Exception as exc:
                if attempt > stage.retries:
                    logger.error("stage %s failed permanently: %s", stage.name, exc)
                    report.failed = stage.name
                    if on_failure is not None:
                        on_failure(stage.name, exc)
                    raise
                logger.warning(
                    "stage %s failed (attempt %d/%d), retrying in %.0fs: %s",
                    stage.name, attempt, stage.retries + 1, stage.retry_delay_s, exc,
                )
                if stage.retry_delay_s:
                    time.sleep(stage.retry_delay_s)
    return ctx, report
