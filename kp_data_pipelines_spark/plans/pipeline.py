"""Declarative pipeline graph (SURVEY.md §7 architecture).

The reference's notebooks are imperative cell sequences; here a pipeline is
data: named stages, each a function ``dict[str, DataFrame] -> DataFrame``
over the outputs of prior stages. Compilation is just composition — the
result stays a lazy logical plan for Catalyst, and independent sink stages
can run as parallel jobs (the reference's §3.1 sub-pipelines are
independent).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Stage:
    name: str
    fn: Callable[..., DataFrame]
    inputs: list[str] = field(default_factory=list)


class Pipeline:
    """A tiny DAG of DataFrame stages with memoized resolution."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._stages: dict[str, Stage] = {}

    def source(self, name: str, fn: Callable[[SparkSession], DataFrame]) -> "Pipeline":
        self._stages[name] = Stage(name, fn, inputs=["__spark__"])
        return self

    def stage(self, name: str, fn: Callable[..., DataFrame], *inputs: str) -> "Pipeline":
        self._stages[name] = Stage(name, fn, inputs=list(inputs))
        return self

    def resolve(self, name: str, _cache: dict[str, DataFrame] | None = None) -> DataFrame:
        cache = _cache if _cache is not None else {}
        if name in cache:
            return cache[name]
        st = self._stages[name]
        if st.inputs == ["__spark__"]:
            out = st.fn(self.spark)
        else:
            args = [self.resolve(i, cache) for i in st.inputs]
            out = st.fn(*args)
        cache[name] = out
        return out
