"""Daily partition calendar + backfill reconciliation (SURVEY §1.1
partitioned-dataset row; reference: etl/partitions/daily.py:11-16 —
DailyPartitionsDefinition tz-pinned with end_offset=1, where "late
data" handling is re-running a partition).

The calendar is timezone-aware because a partition boundary in
Asia/Seoul is not the UTC midnight — getting this wrong shifts
date-boundary rows into the neighboring partition (SURVEY §7.2).
"""

from __future__ import annotations

from datetime import date, datetime, timedelta
from zoneinfo import ZoneInfo


class DailyPartitions:
    """Partition keys 'YYYY-MM-DD' from start_date through today
    (end_offset=1 includes the current, still-filling day — the
    reference's setting)."""

    def __init__(
        self,
        start_date: str = "2024-01-01",
        timezone: str = "Asia/Seoul",
        end_offset: int = 1,
    ):
        self.start = date.fromisoformat(start_date)
        self.tz = ZoneInfo(timezone)
        self.end_offset = end_offset

    def today(self) -> date:
        return datetime.now(self.tz).date()

    def keys(self, until: str | None = None) -> list[str]:
        end = date.fromisoformat(until) if until else self.today()
        end = end + timedelta(days=self.end_offset - 1)
        n = (end - self.start).days
        return [
            (self.start + timedelta(days=i)).isoformat() for i in range(max(0, n + 1))
        ]

    @staticmethod
    def compact(key: str) -> str:
        """'YYYY-MM-DD' -> 'YYYYMMDD' (lake path leaf)."""
        return key.replace("-", "")

    @staticmethod
    def expand(compact_key: str) -> str:
        """'YYYYMMDD' -> 'YYYY-MM-DD'."""
        k = compact_key
        return f"{k[:4]}-{k[4:6]}-{k[6:8]}"


def missing_partitions(
    spark,
    partitions: DailyPartitions,
    lake_base: str,
    tenant_id: str,
    stage: str,
    job_name: str,
    until: str | None = None,
) -> list[str]:
    """Backfill reconciliation: calendar keys with no materialized lake
    partition (reference equivalent: Dagster's backfill UI over missing
    materializations; here it is a pure path diff usable from any
    scheduler)."""
    from dagster_etl_spark.sources.lake import list_partitions

    have = set(list_partitions(spark, lake_base, tenant_id, stage, job_name))
    return [k for k in partitions.keys(until) if partitions.compact(k) not in have]


def backfill(
    runner,
    pipeline_name: str,
    dates: list[str],
) -> dict[str, dict]:
    """Run one pipeline over a list of partition dates (idempotent by
    the keyed-upsert guarantee — re-running a date converges)."""
    return {d: runner.run_pipeline(pipeline_name, d) for d in dates}
