"""Named-query registry: the driver contract surface.

Every implemented operator from SURVEY.md section 2 (and every extension
operator) registers here as a named query ``(spark, sf_dir) -> DataFrame``
plus, when SQL-expressible, a DuckDB oracle SQL string over the same parquet
tables. ``__spark_entry__.queries()`` / ``oracle_sql()`` read this registry.

Aliasing rule (driver compare hashes values under sorted column names):
every computed column is aliased identically in the Spark code and the
oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, *, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, tags, (fn.__doc__ or "").strip())
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every query module exactly once (population side-effect).

    Import order IS registration order IS the order the driver's correctness
    sweep walks the registry — and the sweep caps at 50 entries. The core
    parity surface (the reference's own semantics) therefore registers
    FIRST, then the extension operators in descending novelty; the
    ``ext_relational`` showcase set registers last and absorbs the overflow
    beyond the cap (each of its queries was driver-confirmed green in
    CORRECTNESS_r01.json, so it is the safest surface to leave to the
    pytest oracle gate).
    """
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        parity_agg,
        parity_joins,
        parity_scalar,
        parity_sources,
        parity_tpch,
    )
    from . import (  # noqa: F401
        ext_dedup,
        ext_similarity,
        ext_text,
        ext_training,
        ext_multimodal,
        ext_asof,
        ext_events,
        ext_streaming,
        ext_relational,
    )

    _LOADED = True
