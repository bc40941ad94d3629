"""SQL model layer (SURVEY §2.8 U5) — the dbt replacement: named SQL
models with declared dependencies, materialized as temp views (staging)
or tables/DataFrames (transform) in dependency order.

Reference: etl/factories/dbt_factory.py:102-147 runs ``dbt build`` over
per-tenant projects (staging views -> transform tables, ~25 lines of
SQL total). Spark SQL subsumes the dialect, so a model here is plain
SQL over already-registered views; ``ref()``-style dependencies are the
``depends_on`` list, and schema tests map to validation rules.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from graphlib import TopologicalSorter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SqlModelTestError(AssertionError):
    """A declared schema test failed — the model run is aborted
    (reference semantics: dbt test failures are the pipeline's only
    hard-fail gate, dbt_factory.py `dbt build` stops on test error)."""


@dataclass(frozen=True)
class ColumnTest:
    """One dbt-style declared expectation on a materialized model
    column (reference: etl/tenants/project_01/dbt/models/transform/
    _transform__schema.yml:8-17 — not_null / accepted_values)."""

    column: str
    test: str  # not_null | unique | accepted_values
    values: tuple = ()  # accepted_values only

    def violation_expr(self):
        """Count of violating rows, evaluated inside ONE aggregate
        pass over the model (all tests share a single scan)."""
        c = F.col(self.column)
        if self.test == "not_null":
            cond = c.isNull()
        elif self.test == "accepted_values":
            cond = c.isNotNull() & ~c.isin(*self.values)
        elif self.test == "unique":
            # handled separately (needs countDistinct, dbt counts
            # duplicated non-null values)
            return (F.count(c) - F.count_distinct(c)).alias(self._label())
        else:
            raise ValueError(f"unknown schema test {self.test!r}")
        return F.sum(cond.cast("long")).alias(self._label())

    def _label(self) -> str:
        return f"{self.column}__{self.test}"


@dataclass(frozen=True)
class SqlModel:
    name: str
    sql: str
    depends_on: tuple[str, ...] = ()
    materialize: str = "view"  # view | table(cache) | incremental
    tests: tuple[ColumnTest, ...] = ()
    # incremental materialization (dbt analog): SQL variant run when the
    # target already exists (is_incremental() blocks kept, {{ this }}
    # bound), merged into the target by unique_key via the S9 upsert
    incremental_sql: str | None = None
    unique_key: tuple[str, ...] = ()


@dataclass
class SqlModelProject:
    """A tenant's model set (reference: dbt_project.yml model tree)."""

    models: dict[str, SqlModel] = field(default_factory=dict)

    def add(self, name: str, sql: str, depends_on: tuple[str, ...] = (),
            materialize: str = "view",
            tests: tuple[ColumnTest, ...] = (),
            incremental_sql: str | None = None,
            unique_key: tuple[str, ...] = ()) -> "SqlModelProject":
        self.models[name] = SqlModel(
            name, sql, depends_on, materialize, tests, incremental_sql, unique_key
        )
        return self

    def build_order(self) -> list[str]:
        ts = TopologicalSorter(
            {n: [d for d in m.depends_on if d in self.models] for n, m in self.models.items()}
        )
        return list(ts.static_order())

    def run(
        self, spark: SparkSession, lake_root: str | None = None
    ) -> dict[str, DataFrame]:
        """Materialize every model in dependency order; returns the
        resulting DataFrames keyed by model name. Source tables must
        already be registered as views (sources.fixtures.register_views
        or any createOrReplaceTempView).

        ``materialize="incremental"`` models persist under
        ``lake_root/<name>`` (required for them): the first run writes
        the full result; later runs execute ``incremental_sql`` (with
        the current materialization visible as ``<name>__current``) and
        MERGE it into the target by ``unique_key`` through the S9
        upsert writer — dbt's incremental+unique_key contract on the
        engine's own delete-then-insert semantics.

        Declared column tests run as a HARD gate immediately after each
        model materializes — a violation raises
        :class:`SqlModelTestError` before any downstream model builds,
        mirroring dbt's build-stops-on-test-failure semantics."""
        out: dict[str, DataFrame] = {}
        for name in self.build_order():
            m = self.models[name]
            if m.materialize == "incremental":
                df = self._run_incremental(spark, m, lake_root)
            else:
                df = spark.sql(m.sql)
                if m.materialize == "table":
                    df = df.cache()
            df.createOrReplaceTempView(name)
            if m.tests:
                self._check(df, m)
            out[name] = df
        return out

    @staticmethod
    def _run_incremental(
        spark: SparkSession, m: SqlModel, lake_root: str | None
    ) -> DataFrame:
        import os

        from dagster_etl_spark.sources.lake import check_exists
        from dagster_etl_spark.writers.upsert import upsert_parquet

        if lake_root is None:
            raise ValueError(
                f"incremental model {m.name!r} requires run(lake_root=...)"
            )
        if not m.unique_key:
            # models added directly via add(materialize='incremental')
            # bypass DbtProject.compile's check; without keys the upsert
            # below would fail with an opaque reduce() TypeError
            raise ValueError(
                f"incremental model {m.name!r} requires a non-empty unique_key"
            )
        path = os.path.join(lake_root, m.name)
        if check_exists(spark, path):
            spark.read.parquet(path).createOrReplaceTempView(f"{m.name}__current")
            batch = spark.sql(m.incremental_sql or m.sql)
            upsert_parquet(spark, batch, path, keys=list(m.unique_key))
        else:
            spark.sql(m.sql).write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    @staticmethod
    def _check(df: DataFrame, m: SqlModel) -> None:
        """All of a model's tests in ONE aggregate (single scan — same
        single-pass design as validation.validation_report)."""
        (row,) = df.agg(*[t.violation_expr() for t in m.tests]).collect()
        bad = {k: v for k, v in row.asDict().items() if v}
        if bad:
            raise SqlModelTestError(
                f"model {m.name!r} failed schema tests: "
                + ", ".join(f"{k} ({v} rows)" for k, v in sorted(bad.items()))
            )
