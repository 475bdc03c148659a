"""Fixed-dimension unrolled vector kernels (round-16 experiment) and
the shared general-fold kernels.

Spark's array higher-order functions — ``ArrayAggregate``, ``ZipWith``,
``ArrayTransform`` — are ``CodegenFallback`` expressions: every element
is evaluated through the interpreted path, with a per-element lambda
variable rebind, OUTSIDE whole-stage codegen. For arrays of a FIXED
dimension the fold can be unrolled into a flat chain of
``GetArrayItem``/multiply/add expressions with the SAME left-to-right
association order as the sequential fold:

    fold:     ((((0 + t0) + t1) + t2) ... + t_{dim-1})
    unrolled: ((((0 + t0) + t1) + t2) ... + t_{dim-1})

— the identical sequence of IEEE operations, hence bit-identical
doubles (and trivially identical integers). Every kernel carries a
per-row size guard that falls back to the general fold whenever the
arrays are not exactly ``dim`` long, so the kernels are drop-in equal
on ANY data.

Round-16 measurement verdict (OPTIMIZATION_r16.md): unrolling PAYS only
for SMALL dims — ts_motif's dim-7 integer dot measured consistently
faster (min 0.94 vs 1.17 s) — and LOSES at the embedding dimension
(64): alternating same-session A/B showed stable slowdowns in every
real query (knn 0.64 -> 1.13 s, rrf 1.40 -> 1.70 s) even with the
kernel confined to post-join attribute inputs, and a
``spark.sql.codegen.fallback=false`` probe ruled out a compile
failure. A 64-term nullable add chain is ONE unsplittable generated
code block, which forfeits the JIT/codegen benefits that were the
point of unrolling. The 64-dim call sites therefore use the ``fold_*``
forms below; the unrolled forms stay for small fixed dims.

Two usage rules, learned the measured way:

- Unrolled kernels only on MATERIALIZED attributes (post-join/window/
  generate): ``CollapseProject`` inlines a referenced alias into every
  reference site, so 64 array references re-evaluate a derived input
  (e.g. ``transform(embedding, cast)``) once per TERM — measured
  semantic_dedup_lsh 3.9 -> 10.3 s when the bucket signature was
  unrolled over the inlined transform expression.
- ``SPARK_GRAFT_VEC_UNROLL=0`` flips every unrolled kernel to the
  general fold (the A/B lever; read at expression build time).
"""


from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

#: escape hatch (also the A/B measurement lever): setting
#: SPARK_GRAFT_VEC_UNROLL=0 in the driver environment makes every kernel
#: return the plain general fold — read at EXPRESSION BUILD time, so a
#: long-lived session can flip it between query invocations.


def _unroll_enabled() -> bool:
    return os.environ.get("SPARK_GRAFT_VEC_UNROLL", "1").lower() not in (
        "0", "false", "no",
    )

#: the embeddings corpus dimension — a fixed property of the data
#: generator (TESTDATA.md). NOT a default unroll width: unrolling at 64
#: measured ~2x SLOWER than the fold (module docstring), so every
#: unrolled kernel requires an explicit ``dim`` and callers must choose
#: a width the measurements support (small dims only). Kept as the
#: documented corpus constant for fold-path callers and tests.
EMB_DIM = 64


def fold_dot(a: Column, b: Column) -> Column:
    """General fold dot product (no unroll) — for PER-ROW sites whose
    inputs are derived array EXPRESSIONS (e.g. ``transform(embedding,
    cast)``): ``CollapseProject`` inlines a referenced alias into every
    reference site, so an unrolled kernel's 64+ array references would
    re-evaluate the whole derived-array expression per TERM (measured:
    semantic_dedup_lsh 3.9 -> 10.3 s when the bucket signature was
    unrolled over the inlined transform). The fold references its input
    arrays once each, so it is collapse-safe. Use the unrolled kernels
    only on MATERIALIZED attributes (post-join/window/generate)."""
    return _fold_dot(a, b, F.lit(0.0))


def fold_sum_sq(v: Column) -> Column:
    """General fold sum of squares — see :func:`fold_dot` for when."""
    return _fold_sum_sq(v, F.lit(0.0))


def fold_sqdist(a: Column, b: Column) -> Column:
    """General fold squared-L2 — see :func:`fold_dot` for when."""
    return _fold_sqdist(a, b, F.lit(0.0))


def fold_sqdist_long(a: Column, b: Column) -> Column:
    """General integer fold squared-L2 — see :func:`fold_dot`."""
    return _fold_sqdist(a, b, F.lit(0).cast("long"))


def fold_dot_long(a: Column, b: Column) -> Column:
    """General integer fold dot product (exact long accumulation) — the
    fold twin of :func:`dot_long`, matching the fold_sqdist_long
    pattern so integer kernels can be property-tested against a fold
    that accumulates in the SAME type (a double-zero fold rounds past
    2^53 and would mask or fake differences)."""
    return _fold_dot(a, b, F.lit(0).cast("long"))


def _fold_dot(a: Column, b: Column, zero: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), zero, lambda acc, x: acc + x
    )


def _fold_sum_sq(v: Column, zero: Column) -> Column:
    return F.aggregate(v, zero, lambda acc, x: acc + x * x)


def _fold_sqdist(a: Column, b: Column, zero: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        zero,
        lambda acc, x: acc + x,
    )


def _guarded(a: Column, dim: int, unrolled: Column, fold: Column) -> Column:
    return F.when(F.size(a) == dim, unrolled).otherwise(fold)


def _guarded2(
    a: Column, b: Column, dim: int, unrolled: Column, fold: Column
) -> Column:
    return F.when(
        (F.size(a) == dim) & (F.size(b) == dim), unrolled
    ).otherwise(fold)


def dot(a: Column, b: Column, *, dim: int) -> Column:
    """Sequential left-fold dot product, unrolled at ``dim`` —
    bit-identical to ``aggregate(zip_with(a, b, *), 0.0, +)`` and to the
    oracle's ``list_aggregate`` (same fold order)."""
    if not _unroll_enabled():
        return _fold_dot(a, b, F.lit(0.0))
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + a[i] * b[i]
    return _guarded2(a, b, dim, acc, _fold_dot(a, b, F.lit(0.0)))


def dot_long(a: Column, b: Column, *, dim: int) -> Column:
    """Integer dot product (exact), unrolled at ``dim``."""
    zero = F.lit(0).cast("long")
    if not _unroll_enabled():
        return _fold_dot(a, b, zero)
    acc: Column = zero
    for i in range(dim):
        acc = acc + a[i] * b[i]
    return _guarded2(a, b, dim, acc, _fold_dot(a, b, zero))


def sum_sq(v: Column, *, dim: int) -> Column:
    """Sum of squares (the norm kernel), unrolled at ``dim``."""
    if not _unroll_enabled():
        return _fold_sum_sq(v, F.lit(0.0))
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + v[i] * v[i]
    return _guarded(v, dim, acc, _fold_sum_sq(v, F.lit(0.0)))


def sqdist(a: Column, b: Column, *, dim: int) -> Column:
    """Squared L2 distance, unrolled at ``dim``."""
    if not _unroll_enabled():
        return _fold_sqdist(a, b, F.lit(0.0))
    acc = F.lit(0.0)
    for i in range(dim):
        d = a[i] - b[i]
        acc = acc + d * d
    return _guarded2(a, b, dim, acc, _fold_sqdist(a, b, F.lit(0.0)))


def sqdist_long(a: Column, b: Column, *, dim: int) -> Column:
    """Integer squared L2 distance (exact), unrolled at ``dim``."""
    zero = F.lit(0).cast("long")
    if not _unroll_enabled():
        return _fold_sqdist(a, b, zero)
    acc: Column = zero
    for i in range(dim):
        d = a[i] - b[i]
        acc = acc + d * d
    return _guarded2(a, b, dim, acc, _fold_sqdist(a, b, zero))
