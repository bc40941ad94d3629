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


@dataclass(frozen=True)
class SqlModel:
    name: str
    sql: str
    depends_on: tuple[str, ...] = ()
    materialize: str = "view"  # view | table(cache)


@dataclass
class SqlModelProject:
    """A tenant's model set (reference: dbt_project.yml model tree)."""

    models: dict[str, SqlModel] = field(default_factory=dict)

    def add(self, name: str, sql: str, depends_on: tuple[str, ...] = (),
            materialize: str = "view") -> "SqlModelProject":
        self.models[name] = SqlModel(name, sql, depends_on, materialize)
        return self

    def build_order(self) -> list[str]:
        ts = TopologicalSorter(
            {n: [d for d in m.depends_on if d in self.models] for n, m in self.models.items()}
        )
        return list(ts.static_order())

    def run(self, spark: SparkSession) -> dict[str, DataFrame]:
        """Materialize every model in dependency order; returns the
        resulting DataFrames keyed by model name. Source tables must
        already be registered as views (sources.fixtures.register_views
        or any createOrReplaceTempView)."""
        out: dict[str, DataFrame] = {}
        for name in self.build_order():
            m = self.models[name]
            df = spark.sql(m.sql)
            if m.materialize == "table":
                df = df.cache()
            df.createOrReplaceTempView(name)
            out[name] = df
        return out
