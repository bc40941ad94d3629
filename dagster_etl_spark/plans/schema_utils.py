"""Schema tooling on StructType — SURVEY.md §1.3.

Re-expresses the reference's pandas/PyArrow schema utilities
(reference: etl/utils/parquet.py:29-175) over Spark types: explicit
declaration, name-level validation, drift detection, and coercive
apply (cast with null-on-failure, matching pandas ``errors="coerce"``
under non-ANSI casts).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, _parse_datatype_string


def create_schema(columns: list[tuple[str, str]]) -> StructType:
    """Explicit schema from (name, type-ddl) pairs, e.g. ("qty", "bigint")."""
    return StructType(
        [StructField(name, _parse_datatype_string(t), True) for name, t in columns]
    )


@dataclass
class SchemaValidation:
    valid: bool
    missing: list[str] = field(default_factory=list)
    extra: list[str] = field(default_factory=list)


def validate_schema(df: DataFrame, expected: StructType | list[str]) -> SchemaValidation:
    """Missing/extra column check, names only (reference: parquet.py:80-107)."""
    expected_names = (
        [f.name for f in expected.fields] if isinstance(expected, StructType) else list(expected)
    )
    have = set(df.columns)
    want = set(expected_names)
    missing = sorted(want - have)
    extra = sorted(have - want)
    return SchemaValidation(valid=not missing and not extra, missing=missing, extra=extra)


@dataclass
class SchemaDrift:
    added: list[str] = field(default_factory=list)
    removed: list[str] = field(default_factory=list)
    type_changed: list[tuple[str, str, str]] = field(default_factory=list)

    @property
    def has_drift(self) -> bool:
        return bool(self.added or self.removed or self.type_changed)


def detect_schema_drift(current: StructType, new: StructType) -> SchemaDrift:
    """Added/removed/type-changed columns (reference: parquet.py:110-142)."""
    cur = {f.name: f.dataType.simpleString() for f in current.fields}
    nxt = {f.name: f.dataType.simpleString() for f in new.fields}
    return SchemaDrift(
        added=sorted(set(nxt) - set(cur)),
        removed=sorted(set(cur) - set(nxt)),
        type_changed=sorted(
            (n, cur[n], nxt[n]) for n in set(cur) & set(nxt) if cur[n] != nxt[n]
        ),
    )


def apply_schema(df: DataFrame, schema: StructType, keep_extra: bool = False) -> DataFrame:
    """Coercive cast to ``schema``: bad values -> null via ``try_cast``
    (pandas ``errors='coerce'`` semantics, ANSI-safe on Spark 4),
    missing columns -> null columns, column order follows the schema."""
    cols = []
    for f in schema.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).try_cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    if keep_extra:
        declared = {f.name for f in schema.fields}
        cols += [F.col(c) for c in df.columns if c not in declared]
    return df.select(*cols)
