"""Schema registry + conform/drift utilities (SURVEY.md §1.3).

The reference's defensive schema patching, made first-class:
- explicit StructType per dataset (replaces whole-file inference),
- ``conform``: project/reorder to the registered schema, creating missing
  columns as typed NULLs (DOP VP Compare.py:64-73; Saoirse
  Automation.ipynb:793-808),
- ``check_drift``: set-difference both directions, raise on mismatch
  (Saoirse Automation.ipynb:337-360).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class SchemaDriftError(ValueError):
    pass


class SchemaRegistry:
    def __init__(self) -> None:
        self._schemas: dict[str, StructType] = {}

    def register(self, name: str, schema: StructType) -> None:
        self._schemas[name] = schema

    def get(self, name: str) -> StructType:
        return self._schemas[name]

    def conform(self, df: DataFrame, name: str) -> DataFrame:
        """Project + reorder to the registered schema; missing columns become
        typed NULLs; extra columns are dropped; types are cast defensively —
        try_cast, so an unparseable value lands as NULL instead of the
        ANSI-mode (Spark 4 default) cast exception killing the pipeline
        (matching the reference's coerce-style patching)."""
        schema = self.get(name)
        cols = []
        have = set(df.columns)
        for field in schema.fields:
            if field.name in have:
                cols.append(
                    F.col(field.name).try_cast(field.dataType).alias(field.name)
                )
            else:
                cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        return df.select(*cols)

    def check_drift(self, df: DataFrame, name: str) -> None:
        """U3: raise if the column *set* differs from the registered schema
        (the reference's archive-comparison guard)."""
        expected = {f.name for f in self.get(name).fields}
        actual = set(df.columns)
        missing, extra = expected - actual, actual - expected
        if missing or extra:
            raise SchemaDriftError(
                f"schema drift for {name!r}: missing={sorted(missing)} extra={sorted(extra)}"
            )
