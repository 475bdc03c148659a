"""Near-duplicate detection operators over text (SURVEY.md section 2.7):
MinHash-LSH and SimHash, built from composable DataFrame primitives.

Design constraints:
- Deterministic: every hash is derived from md5 (identical in Spark and
  DuckDB) plus integer arithmetic inlined from constants below, so each
  operator has an *exact* SQL oracle.
- Spark-first at 100 TB: shingle/explode is map-side; signatures are one
  hash aggregate per doc; LSH banding turns the quadratic all-pairs problem
  into an equi-join on (band_idx, band_key) — the only shuffles are the
  signature groupBy and the band join. Hot bands (huge buckets) are the
  skew risk: `max_bucket_size` drops degenerate buckets, the standard
  production guard.

MinHash math: h_j(x) = (a_j * x + b_j) mod P over 61-bit token hashes
reduced mod P (P = 2^31 - 1 keeps every product within int64).
Band config r=2, b=8 (16 perms): P(candidate | s=0.6) = 1-(1-0.6^2)^8 ~ 0.97.
Candidates are verified with the exact n-gram Jaccard, so banding affects
recall only, never correctness of reported pairs.
"""

from __future__ import annotations

import os
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from .checkpointing import cut_lazy

MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
N_PERM = 16
LSH_ROWS = 2  # rows per band
LSH_BANDS = N_PERM // LSH_ROWS

_rng = random.Random(42)
MINHASH_A = [_rng.randrange(1, MINHASH_P) for _ in range(N_PERM)]
MINHASH_B = [_rng.randrange(0, MINHASH_P) for _ in range(N_PERM)]

SIMHASH_BITS = 32  # 16 bits collides wildly on small-vocab corpora
SIMHASH_BAND_BITS = 8
SIMHASH_BANDS = SIMHASH_BITS // SIMHASH_BAND_BITS
SIMHASH_MAX_HAMMING = 3  # <= bands-1, so pigeonhole guarantees a shared band

# Hot-band guard: an LSH bucket larger than this is degenerate (boilerplate
# text hashing to one band key) and is dropped before the candidate
# self-join — a bucket of n docs contributes n*(n-1)/2 candidates, so one
# boilerplate band at 100 TB otherwise dominates the whole join. 64 is far
# above any honest bucket at bench scale (max observed: 3 at sf0.01, 11 at
# sf0.1), so the guard costs no recall where we can measure it.
LSH_MAX_BUCKET = 64

# Random-hyperplane (sign-signature) LSH over embeddings: the bucket space
# must GROW with the corpus or the hot-bucket guard above silently drops
# recall — with a fixed 8-plane/256-bucket signature, a corpus of N vectors
# needs ~N/64 buckets, so at 100x data nearly every bucket trips the guard
# and is excluded. The plane count is therefore derived from the corpus
# size, targeting an average bucket load of LSH_MAX_BUCKET/4 (the guard
# stays the exception, not the rule):
#   planes = clamp(ceil(log2(ceil(n / target_load))), 4, 26)
# computed in EXACT integer arithmetic (bit_length / bin-string length, not
# float log2 — a last-ulp log2 difference between engines would flip a
# ceil) and single-sourced here so the Spark plan, the DuckDB oracle, and
# the tests cannot diverge. 26 planes = 67M buckets covers ~4e9 vectors at
# the target load — past any single-table corpus this engine will meet.
LSH_TARGET_BUCKET_LOAD = LSH_MAX_BUCKET // 4
LSH_MIN_PLANES = 4
LSH_MAX_PLANES = 26


def lsh_n_planes(n_vecs: int) -> int:
    """Hyperplane count for a corpus of ``n_vecs`` embeddings (python
    form; :func:`lsh_n_planes_sql` is the DuckDB twin — both exact
    integer arithmetic, equality property-tested)."""
    k = (n_vecs + LSH_TARGET_BUCKET_LOAD - 1) // LSH_TARGET_BUCKET_LOAD
    raw = (k - 1).bit_length() if k > 1 else 0
    return min(LSH_MAX_PLANES, max(LSH_MIN_PLANES, raw))


def lsh_n_planes_sql(count_expr: str) -> str:
    """DuckDB twin of :func:`lsh_n_planes` over a SQL count expression
    (``length(bin(k-1))`` is ``(k-1).bit_length()`` for k > 1)."""
    k = f"((({count_expr}) + {LSH_TARGET_BUCKET_LOAD - 1}) // {LSH_TARGET_BUCKET_LOAD})"
    return (
        f"least({LSH_MAX_PLANES}, greatest({LSH_MIN_PLANES}, "
        f"CASE WHEN {k} <= 1 THEN 0 ELSE length(bin({k} - 1)) END))"
    )


#: IVF coarse-quantizer sizing: the deterministic codebook keeps a
#: roughly CONSTANT centroid count (~IVF_CENTROID_TARGET) instead of a
#: fixed sampling rate — a fixed rate makes centroid count grow with
#: the corpus and the assignment crossJoin quadratic (round-13: 26 s
#: at sf1). Floor of 23 preserves the historical small-corpus rule.
IVF_CENTROID_TARGET = 256
IVF_CENTROID_MIN_MOD = 23


def ivf_centroid_mod(n_vecs: int) -> int:
    """Sampling modulus for the deterministic IVF codebook: vectors
    with ``vec_id % mod == 0`` are centroids, sized so centroid count
    is ~IVF_CENTROID_TARGET at any corpus size (python form;
    :func:`ivf_centroid_mod_sql` is the DuckDB twin)."""
    return max(IVF_CENTROID_MIN_MOD,
               -(-n_vecs // IVF_CENTROID_TARGET))


def ivf_centroid_mod_sql(count_expr: str) -> str:
    """DuckDB twin of :func:`ivf_centroid_mod` over a SQL count.

    Integer ceil via ``(n + T - 1) // T`` — NOT ``ceil(n / T.0)``, whose
    double division loses exactness past 2^53 and would diverge from the
    python twin's exact integer arithmetic (round-13 advice)."""
    return (
        f"greatest({IVF_CENTROID_MIN_MOD}, "
        f"CAST((({count_expr}) + {IVF_CENTROID_TARGET - 1}) "
        f"// {IVF_CENTROID_TARGET} AS BIGINT))"
    )


def token_hash(col: Column) -> Column:
    """Deterministic 60-bit integer hash of a string, identical in DuckDB:
    first 15 hex chars of md5 -> bigint."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def token_hash_sql(expr: str) -> str:
    """DuckDB twin of :func:`token_hash`."""
    return f"cast(concat('0x', substr(md5({expr}), 1, 15)) AS bigint)"


def word_tokens(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"[ \t\n\r\f]+")


#: the incremental-dedup tile size — single-sourced here so the batch
#: screen, its SQL oracle, and the streaming twin can never diverge.
TILE_TOKENS = 8


def tile_fingerprints(text: Column, *, tile_tokens: int = TILE_TOKENS) -> Column:
    """The document's DISTINCT non-overlapping ``tile_tokens``-token md5
    tiles as one array<string> column (empty when the document is
    shorter than one tile) — the shared fingerprint rule of the
    incremental dedup screen: the batch form
    (queries/ext_governance.py:dedup_incremental_batch) and the
    streaming twin (streaming/windows.py:document_fingerprints) both
    key on exactly this expression, so the rule cannot silently
    diverge between them."""
    t = word_tokens(text)
    ntiles = F.floor(F.size(t) / F.lit(tile_tokens)).cast("int")
    return F.when(
        ntiles >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), ntiles),
                lambda i: F.md5(
                    F.concat_ws(
                        " ", F.slice(t, (i - 1) * tile_tokens + 1, tile_tokens)
                    )
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


# widen() graduated to sources/lake.py (generic scan utility, also used by
# the similarity queries); re-exported here for its original callers.
from ..sources.lake import widen  # noqa: E402,F401


def doc_shingles(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
                 n: int = 3) -> DataFrame:
    """(id, gram): distinct word n-gram shingles per document."""
    toks = word_tokens(F.col(text_col))
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        )
    )
    return widen(df.where(F.size(toks) >= n)).select(
        F.col(id_col), F.explode(grams).alias("gram")
    )


def _shingle_arrow_enabled() -> bool:
    """A/B lever for the Arrow shingle-hash kernel (read at plan build
    time). Default ON — the r16-verdict sf10 measurement decided KEEP:
    interleaved same-session A/B on dedup_minhash_lsh at sf10 (500k
    docs) read min 60.5 / med 70.5 s for the JVM expression chain vs
    min 7.4 / med 9.0 s for the Arrow kernel (~8x; the JVM minimum
    matches its r16 quiet band of 64.6 s, so the contended host did not
    manufacture the gap), with the full result set EXACTLY equal at
    sf10 (count + order-free row-hash digests, `.round17/eq_check.py`).
    At sf0.1 (fixed-cost-bound): 1.77 vs 2.27 s minima, same direction.
    ``0`` restores the r16 JVM expression form verbatim."""
    return os.environ.get("SPARK_GRAFT_SHINGLE_ARROW", "1").lower() not in (
        "0", "false", "no",
    )


def _doc_shingle_hash_sets_arrow(
    df: DataFrame, *, id_col: str, text_col: str, n: int
) -> DataFrame:
    """mapInArrow twin of :func:`doc_shingle_hash_sets`: same tokens, same
    grams, same md5-derived hashes mod P, same first-occurrence-distinct
    order — computed per Arrow batch with CPython's C md5 instead of the
    JVM's per-gram expression chain (guide §4.2: hand whole batches to
    native code). Semantics pinned to the JVM form expression by
    expression: trim strips SPACES only (Spark F.trim default), the
    tokenizer keeps empty tokens exactly like Java regex split with
    limit -1, grams join with a single space, hashes are
    int(md5_hex[:15], 16) % P (both operands positive, so Spark/Python %
    agree), and docs with fewer than ``n`` tokens (or null text) drop."""
    import pyarrow as pa

    def kernel(batches):
        import hashlib
        import re as _re

        split = _re.compile(r"[ \t\n\r\f]+").split
        md5 = hashlib.md5
        p = MINHASH_P
        join = " ".join
        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out_ids: list[int] = []
            out_sets: list[list[int]] = []
            for did, txt in zip(ids, texts):
                if txt is None:
                    continue
                toks = split(txt.strip(" ").lower())
                m = len(toks) - (n - 1)
                if m < 1:
                    continue
                seen: dict[int, None] = {}
                for i in range(m):
                    h = int(
                        md5(join(toks[i : i + n]).encode("utf-8")).hexdigest()[:15],
                        16,
                    ) % p
                    if h not in seen:
                        seen[h] = None
                out_ids.append(did)
                out_sets.append(list(seen))
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_ids, pa.int64()), pa.array(out_sets, pa.list_(pa.int64()))],
                [id_col, "xs"],
            )

    return widen(df.select(F.col(id_col), F.col(text_col))).mapInArrow(
        kernel, f"{id_col} long, xs array<long>"
    )


def doc_shingle_hash_sets(df: DataFrame, *, id_col: str = "doc_id",
                          text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, xs): the document's distinct hashed word-n-gram shingle SET as
    one array<long> column, x = token_hash(gram) mod P.

    Keeping the set in-row (instead of exploding it) makes the whole
    MinHash pipeline shuffle-free until the band join: the signature is an
    array fold per row, set sizes are `size(xs)`, and the Jaccard verify is
    `array_intersect` on the two docs' arrays. A web-scale doc carries a
    few thousand shingles (~tens of KB) — far below any row-size concern.
    Jaccard over hashed shingle sets is the standard MinHash formulation;
    the oracle hashes identically, so the rare mod-P collision is
    bit-identical on both engines."""
    if _shingle_arrow_enabled():
        return _doc_shingle_hash_sets_arrow(
            df, id_col=id_col, text_col=text_col, n=n
        )
    toks = word_tokens(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    hashes = F.array_distinct(F.transform(grams, lambda g: token_hash(g) % MINHASH_P))
    return widen(df.where(F.size(toks) >= n)).select(
        F.col(id_col), hashes.alias("xs")
    )


def minhash_signature(sets: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """One row per doc with columns mh0..mh{k-1}, computed as in-row array
    folds over the shingle-hash set of :func:`doc_shingle_hash_sets` —
    a pure map, NO aggregate and NO shuffle (the groupBy formulation moves
    every (doc, shingle) pair through an exchange; this moves nothing)."""
    mins = [
        F.array_min(
            F.transform(F.col("xs"), lambda x: (F.lit(a) * x + F.lit(b)) % MINHASH_P)
        ).alias(f"mh{j}")
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return sets.select(F.col(id_col), *mins)


def lsh_banded(sig: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Explode a minhash signature into its LSH band rows:
    (id, band_idx, band_key) — the relation both the candidate join and the
    band-load diagnostic (queries/ext_metrics.lsh_band_load_report) group
    on. In-row struct-array explode, no shuffle."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "_", *[F.col(f"mh{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]
                ).alias("band_key"),
            )
            for b in range(LSH_BANDS)
        ]
    )
    return sig.select(F.col(id_col), F.explode(bands).alias("band")).select(
        id_col, F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_key").alias("band_key"),
    )


def lsh_candidate_pairs(
    sig: DataFrame, *, id_col: str = "doc_id", max_bucket_size: int | None = None
) -> DataFrame:
    """Band the signature and equi-join on (band_idx, band_key):
    (doc_a, doc_b) candidate pairs, doc_a < doc_b."""
    banded = lsh_banded(sig, id_col=id_col)
    if max_bucket_size is not None:
        # window count over the SAME (band_idx, band_key) partitioning the
        # candidate self-join shuffles on — one pass, no extra join (a
        # groupBy+join guard would re-aggregate the signature relation a
        # third time). The physical plan does not actually reuse the
        # window's exchange for the join sides (measured: 3 exchanges,
        # 0 reused, and a lineage cut on the banded relation is
        # warm-neutral because the signature folds JIT-compile once), so
        # the claim here is one pass per join side, not one pass total.
        from pyspark.sql import Window

        w = Window.partitionBy("band_idx", "band_key")
        banded = (
            banded.withColumn("__n", F.count(F.lit(1)).over(w))
            .where(F.col("__n") <= max_bucket_size)
            .drop("__n")
        )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def prefix_filter_candidates(
    sets: DataFrame, *, id_col: str = "doc_id", t_num: int = 3, t_den: int = 5
) -> DataFrame:
    """PPJoin-style prefix-filtered candidate pairs for Jaccard >= t
    (t = t_num/t_den, a rational so the prefix length is exact integer
    arithmetic in both engines).

    Sort each document's shingle-hash set by a global total order —
    ascending document frequency, rarest first, ties by hash value — and
    keep only the first ``|s| - ceil(t*|s|) + 1`` elements (the prefix).
    Any pair with Jaccard >= t must share at least one prefix element
    (if all o >= ceil(t*|s|) common elements sat outside the prefix, the
    suffix would need ceil(t*|s|) - 1 >= o slots — contradiction), so the
    prefix self-equi-join is a COMPLETE candidate generator: unlike LSH
    banding it can never drop a true pair, and unlike the full shingle
    self-join it joins on ~(1-t) of the set mass, and on the *rarest*
    tokens — the frequency sort steers the join away from hot keys, which
    is the built-in skew guard (the hottest shingles land in suffixes).

    The join applies the full PPJoin pruning stack, all of which only
    SHRINKS the candidate set (completeness is untouched):

    - length filter, inside the join condition: Jaccard >= t forces
      t * max(|a|, |b|) <= min(|a|, |b|), so wildly different set sizes
      never pair at all;
    - grouped positional filter (PPJoin+-style, r15 verdict item 3):
      the pair-dedup groupBy (which replaces the old ``distinct`` — the
      same shuffle, now with an aggregate payload) counts the shared
      prefix elements ``c`` and keeps their LAST positions, giving the
      overlap upper bound ``c + min(|a| - pa_last, |b| - pb_last)``,
      which must reach the required overlap
      ceil(t/(1+t) * (|a| + |b|)). Valid for true pairs: any common
      element ordered before the last shared prefix element y sits at
      positions < pa_last / < pb_last in both sets (the sets share one
      global sort order), hence inside both prefixes, hence IS one of
      the ``c`` counted shared elements; everything ordered after y
      contributes at most the min-tail term. This strictly dominates
      the per-element form of the filter (1 + min-tail at the FIRST
      shared element): walking shared elements first->last, positions
      grow by at least one per element, so
      ``c + min_tail_last <= 1 + min_tail_first`` — the r14-r15 row
      filter is subsumed, and only provably sub-threshold pairs are
      dropped, so the exact verify's candidate constant shrinks with
      zero effect on the verified output.

    Cost: one groupBy for document frequencies, one per-doc window to
    rank, one equi-join on prefix hashes whose output combines map-side
    into one (pair, c, pa_last, pb_last) record per map partition. At
    100 TB this is the standard exact set-similarity-join plan
    (PPJoin); the filters cut candidates by orders of magnitude before
    the pair-dedup + verify.
    """
    from pyspark.sql import Window

    ex = sets.select(
        F.col(id_col), F.size("xs").alias("n"), F.explode("xs").alias("x")
    )
    dfreq = ex.groupBy("x").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy(id_col).orderBy("df", "x")
    prefix_len = F.col("n") - F.expr(f"({t_num} * n + {t_den - 1}) div {t_den}") + 1
    # lineage-cut: the prefix relation feeds BOTH sides of the self-join,
    # and without the cut the whole explode -> df-aggregate -> window
    # chain (three shuffles) runs twice
    prefix = (
        ex.join(dfreq, "x")
        .withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= prefix_len)
        .select(id_col, "x", "n", "pos")
        .transform(cut_lazy)
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    grouped = (
        a.join(
            b,
            (F.col("a.x") == F.col("b.x"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            # length filter: t * max <= min, both directions
            & (F.col("a.n") * t_num <= F.col("b.n") * t_den)
            & (F.col("b.n") * t_num <= F.col("a.n") * t_den),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.max("a.pos").alias("pa_last"),
            F.max("b.pos").alias("pb_last"),
        )
    )
    # required overlap o >= ceil(t * (na + nb) / (1 + t)), kept rational
    o_min_pair = F.expr(
        f"({t_num} * (na + nb) + {t_num + t_den} - 1) div {t_num + t_den}"
    )
    tail = F.least(
        F.col("na") - F.col("pa_last"), F.col("nb") - F.col("pb_last")
    )
    return (
        grouped.where(F.col("shared") + tail >= o_min_pair)
        .select("doc_a", "doc_b")
    )


def jaccard_verify_sets(
    pairs: DataFrame, sets: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """Exact Jaccard for candidate pairs from in-row shingle-hash SETS
    (:func:`doc_shingle_hash_sets`): two joins on doc id bring both arrays
    onto the pair row, then `array_intersect` computes the overlap in-row —
    no explode, no per-gram shuffle; the joined volume is (candidate pairs
    x two arrays), tiny next to the corpus."""
    a = sets.select(F.col(id_col).alias("doc_a"), F.col("xs").alias("xa"))
    b = sets.select(F.col(id_col).alias("doc_b"), F.col("xs").alias("xb"))
    n_inter = F.size(F.array_intersect(F.col("xa"), F.col("xb")))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                n_inter.cast("double")
                / (F.size("xa") + F.size("xb") - n_inter)
            ).alias("jaccard_raw"),
        )
    )


# --- SimHash -----------------------------------------------------------------


def _simhash_packed_enabled() -> bool:
    """A/B lever for the lane-packed SimHash bit counter (read at
    expression build time, like functions/vec.py's unroll lever).
    ``0`` restores the r16 production form verbatim (32 per-bit folds,
    unfenced projection)."""
    return os.environ.get("SPARK_GRAFT_SIMHASH_PACKED", "1").lower() not in (
        "0", "false", "no",
    )


def _simhash_bits_perbit(hs: Column) -> Column:
    """The per-bit formulation: 32 interpreted array folds, one per
    SimHash bit — s_b = sum over tokens of (2*bit_b(h) - 1), bit set iff
    s_b > 0. Kept verbatim as the A/B lever's baseline
    (SPARK_GRAFT_SIMHASH_PACKED=0)."""

    # closure factory, NOT a default arg: F.aggregate counts the lambda's
    # parameters (defaults included) to build the HOF
    def merge(b):
        return lambda acc, h: acc + (
            F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1
        )

    sh = None
    for b in range(SIMHASH_BITS):
        s_b = F.aggregate(hs, F.lit(0).cast("long"), merge(b))
        bit = F.when(s_b > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sh = bit if sh is None else sh + bit
    return sh


def _simhash_packed_accs(hs: Column) -> list[Column]:
    """16 fold accumulators, each counting 2 of the 32 hash bits in the
    32-bit lanes of one long: fold g adds, per token hash h,
    ((h >> 2g) & 1) + (((h >> (2g+1)) & 1) << 32). UNCONDITIONALLY
    exact — no guard, no fallback: each lane's count is bounded by the
    array length, which Spark caps below 2^31, so the low lane can never
    carry into the high lane and the high lane can never reach the sign
    bit. (A denser 16-bit-lane packing needs a per-row overflow guard,
    and the guard's untaken 32-fold fallback branch alone measured
    ~+2 s at sf0.1 — plan/codegen weight, not row work; the 32-bit-lane
    form was within noise of the guarded one and needs neither.)"""

    def lane_sum(g):
        def merge(acc, h):
            lo = F.shiftright(h, 2 * g).bitwiseAND(F.lit(1))
            hi = F.shiftleft(
                F.shiftright(h, 2 * g + 1).bitwiseAND(F.lit(1)), 32
            )
            return acc + lo + hi
        return merge

    return [
        F.aggregate(hs, F.lit(0).cast("long"), lane_sum(g))
        for g in range(SIMHASH_BITS // 2)
    ]


def simhash(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash): 32-bit SimHash over word unigrams, unit weights.
    bit_b(doc) = 1 iff sum over tokens of (2*bit_b(h(token)) - 1) > 0.

    Computed entirely on the in-row token array (hash once per distinct
    token) — a pure map over the corpus scan, like the MinHash signature:
    the whole dedup family shuffles nothing until its banding self-join.

    Round-17 (guide §4, §1.2 per-task work), two measured changes:

    - The projection stages are FENCED (functions/numeric.project_fence)
      so the token-hash transform materializes once per row instead of
      being re-evaluated through the merged projection — the fence alone
      took the sf0.1 signature stage from a 2.9 s minimum to 1.0 s.
    - The 32 per-bit folds are replaced by 16 lane-packed COUNT folds
      (32-bit lanes, :func:`_simhash_packed_accs`): with c_b = count of
      tokens with bit b set and n = token count, the per-bit fold's sum
      is s_b = 2*c_b - n, so s_b > 0 <=> 2*c_b > n — the packed readout
      tests exactly that, hence bit-identical simhashes (property-tested
      row-for-row, tests/test_round17_props.py). Halves the fold passes
      over the token array; exact at ANY document length, no guard."""
    from ..functions.numeric import project_fence

    hs = F.transform(
        F.array_distinct(word_tokens(F.col(text_col))), lambda t: token_hash(t)
    )
    base = widen(df).select(F.col(id_col), hs.alias("hs"))
    if not _simhash_packed_enabled():
        return base.select(
            F.col(id_col), _simhash_bits_perbit(F.col("hs")).cast("long").alias("simhash")
        )
    with_accs = base.transform(project_fence).select(
        F.col(id_col),
        F.size(F.col("hs")).alias("_n"),
        *[
            acc.alias(f"_acc{g}")
            for g, acc in enumerate(_simhash_packed_accs(F.col("hs")))
        ],
    )
    n = F.col("_n")
    sh = None
    for b in range(SIMHASH_BITS):
        g, j = divmod(b, 2)
        c = F.shiftright(F.col(f"_acc{g}"), 32 * j).bitwiseAND(
            F.lit(0xFFFFFFFF)
        )
        bit = F.when(c * 2 > n, F.lit(1 << b)).otherwise(F.lit(0))
        sh = bit if sh is None else sh + bit
    return with_accs.transform(project_fence).select(
        F.col(id_col), sh.cast("long").alias("simhash")
    )


def simhash_near_pairs(sh: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """SimHash-LSH: band the 32 bits into 4 bytes; hamming <= 3 guarantees
    (pigeonhole) one shared byte-band, so the band join loses no true pair.
    Returns (doc_a, doc_b, hamming)."""
    bands = F.array(
        *[
            F.struct(
                F.lit(k).alias("band_idx"),
                F.shiftright(F.col("simhash"), k * SIMHASH_BAND_BITS)
                .bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1))
                .alias("band_key"),
            )
            for k in range(SIMHASH_BANDS)
        ]
    )
    banded = sh.select(F.col(id_col), F.col("simhash"), F.explode(bands).alias("b")).select(
        id_col, "simhash", F.col("b.band_idx").alias("band_idx"),
        F.col("b.band_key").alias("band_key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )


# --- connected components (cluster the near-dup pair graph) -------------------


#: adaptive loop-partitioning target (edges per reduce partition). The
#: loop's per-round relations are (u, v) long pairs — 16 B of data per
#: row — so 100k rows is ~2 MB: far below the guide's 100 MB-1 GB
#: band, chosen because the loop's cost at SMALL residues is per-stage
#: task/scheduler overhead, not bytes. Any residue >= 100k x (session
#: width) edges keeps the session's full width (the sf10 trade graph's
#: 3.2M edges stay at 32 on the 32-core bench), so at-scale rounds are
#: unaffected; only the small tail narrows.
_CC_EDGES_PER_PART = 100_000


def _cc_adaptive_parts() -> bool:
    """Lever (round-17, guide §2: make partitioning scale-adaptive):
    inside the CC loop, size `spark.sql.shuffle.partitions` from the
    OBSERVED per-round edge count (known for free from the convergence
    checksum) instead of the session constant — a 32k-edge round on 32
    partitions runs every stage as 32 near-empty tasks, and the loop's
    wall is exactly that per-task overhead times stages times rounds.
    Never widens beyond the session setting (the 8-core bench keeps its
    8), derived from data size (not the local core count), restored
    after the loop."""
    return os.environ.get("SPARK_GRAFT_CC_ADAPTIVE_PARTS", "1").lower() not in (
        "0", "false", "no",
    )


def _cc_midcut_lazy() -> bool:
    """A/B lever (round-17): materialize the per-round LARGE-star edge set
    lazily — the small-star checkpoint's job computes and caches it in the
    SAME action — instead of paying a separate eager localCheckpoint job
    per round. Read at loop build time; default OFF until the interleaved
    measurement decides (the risk: within one job, parallel map stages
    over the not-yet-cached lazy checkpoint can duplicate its compute)."""
    return os.environ.get("SPARK_GRAFT_CC_MIDCUT_LAZY", "0").lower() not in (
        "0", "false", "no",
    )


def connected_components(
    edges: DataFrame,
    *,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 30,
    reliable: bool | None = None,
) -> DataFrame:
    """Min-label propagation over an undirected edge list: every node ends
    with label = min node id reachable from it (its cluster representative).
    Returns (node, cluster_rep).

    Iterative Spark algorithm (the engine's one loop): each round joins
    labels to neighbors and takes the min — O(graph diameter) rounds, each
    one shuffle on node id. The symmetrized edge list localCheckpoints
    ONCE before the loop (otherwise every round re-executes the upstream
    pair generator — measured 3-4x the whole operator on the near-dup
    compositions), per-round `localCheckpoint` truncates the growing
    label lineage, and the convergence count rides the checkpoint job via
    ``df.observe`` (same zero-extra-scan idiom as the two-phase variant)
    instead of a separate join+count job per round. Raises if not
    converged within `max_iter` (near-dup cluster diameters are tiny in
    practice).

    ``reliable=True`` swaps the per-round localCheckpoint for a reliable
    ``checkpoint()`` into the registered checkpoint directory (see
    :func:`..operators.checkpointing.cut_lineage`) so executor loss
    mid-loop does not kill the job on a real cluster; the executor-local
    default is right for local[n]."""
    from pyspark.sql import Observation

    from .checkpointing import cut_lineage

    sym = cut_lineage(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).union(
            edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        ),
        reliable=reliable,
    )
    labels = cut_lineage(
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node")),
        reliable=reliable,
    )
    for _ in range(max_iter):
        nbr = (
            sym.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("label").alias("dst_label")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dst_label").alias("nbr_label"))
            .withColumnRenamed("src", "node")
        )
        new_label = F.least(
            F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
        )
        obs = Observation()
        new_labels = cut_lineage(
            labels.join(nbr, "node", "left")
            .select(
                "node",
                new_label.alias("label"),
                (new_label < F.col("label")).cast("long").alias("_chg"),
            )
            .observe(obs, F.sum("_chg").alias("changed"))
            .select("node", "label"),
            reliable=reliable,
        )
        changed = obs.get["changed"] or 0
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("label").alias("cluster_rep"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def connected_components_two_phase(
    edges: DataFrame,
    *,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 20,
    distinct_bipartite_input: bool = False,
    reliable: bool | None = None,
    frontier: bool = True,
    frontier_min_edges: int = 1_000_000,
    frontier_min_retire_frac: float = 0.05,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contractions (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — the 100 TB replacement for plain min-label propagation:
    label propagation needs O(graph diameter) rounds (a path graph of n
    nodes needs n rounds), while star contractions converge in
    O(log^2 n) regardless of diameter. Returns (node, cluster_rep).

    Per round over the symmetrized edge list:
    - large-star: every node points its STRICTLY LARGER neighbors at the
      minimum of its closed neighborhood m(u) = min(N(u) + {u});
    - small-star: every node points its smaller-or-equal neighbors and
      itself at m(u).
    Both are one groupBy(min) + one join keyed on node id — hash
    partitioned, hub skew handled by AQE. Convergence is detected by an
    order-free edge-set checksum (count + sum of a symmetric hash) that
    rides the checkpoint materialization job via ``df.observe`` — zero
    extra scans per round — and the final star edges read out as
    (node, component-min) directly.

    ``reliable=True`` swaps every per-round localCheckpoint for a
    reliable ``checkpoint()`` into the registered checkpoint directory
    (see :func:`..operators.checkpointing.cut_lineage`): executor-local
    blocks die with a lost executor, which on a real cluster would kill
    the whole loop; the local default is right for local[n].

    ``frontier`` (r15 verdict item 4) retires resolved leaves out of
    the live edge set from round 2 onward, so later rounds shuffle only
    the unresolved residue. The r16 profile showed why: on the sf10
    trade graph the edge count stays pinned at ~3.16M for all four
    rounds — every non-min node keeps its (node, min) edge until global
    convergence — so rounds 2-4 spend ~10 s re-shuffling a graph that
    is already ~all stars. The retirement rule: a node ``u`` with
    degree 1 whose only neighbor ``v`` satisfies ``v < u`` can never be
    a closed-neighborhood minimum for anyone (it appears only in N(v),
    where v < u already), so deleting its edges changes no other
    node's m(u) and no component membership; its final label is exactly
    v's final label. Targets of retirements are pinned (never retired
    themselves), so the readout resolves every retired node with ONE
    join against the residual labels — a pinned target that lost all
    its edges is its own component minimum (everything it lost was a
    larger leaf), and reads out as a root. The degree needed by the
    rule rides the SAME groupBy as the large-star minimum (zero extra
    aggregates); the cost is two anti-joins per round over the residue.
    Output is exactly equal to ``frontier=False`` (property-tested).

    Retirement is ADAPTIVE (the r16 measurements at both scales):
    candidates are computed only while the live edge set holds at least
    ``frontier_min_edges`` rows (below that a whole round costs about a
    second and pruning cannot save more than its own anti-joins — the
    sf0.1 trade graph measurably LOST 1.1 s to unconditional pruning),
    and applied only when at least ``frontier_min_retire_frac`` of the
    edges would disappear (a path graph retires just its two endpoints
    per round — anti-joining millions of edges to delete two is pure
    waste, and the star rounds already collapse paths in log rounds).
    An empty edge set short-circuits convergence immediately (a graph
    with no edges cannot change), so mass retirement does not pay an
    extra confirmation round.

    ``stats``, if given a dict, receives ``stats["rounds"]`` — the
    number of large-star/small-star rounds run before the checksum
    fixed point (the convergence-detection round included). This is
    the observable the log-round scale claim is property-tested on
    (tests/test_round15_props.py: rounds grow logarithmically, not
    linearly, in path-graph diameter). It also receives
    ``stats["edges_per_round"]`` — the symmetrized edge count after
    each small-star checkpoint, read off the SAME observation the
    convergence checksum rides (zero extra scans): the r15 verdict's
    per-round cost split (edges shuffled per round x round count) is
    exactly this list — and ``stats["retired_per_round"]`` when
    ``frontier`` is on."""
    from pyspark.sql import Observation

    from .checkpointing import cut_lineage

    def checkpoint_with_checksum(ed):
        """Materialize one round's edge set eagerly (cuts lineage so each
        round's plan stays constant-size) and collect the convergence
        checksum ON the same job: the Observation accumulates during the
        checkpoint scan, so convergence detection costs no extra action."""
        obs = Observation()
        observed = cut_lineage(
            ed.observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.sum(F.xxhash64(F.col("u"), F.col("v"))).alias("h"),
            ),
            reliable=reliable,
        )
        got = obs.get
        return observed, (got["n"], got["h"])

    e = (
        edges.select(
            F.col(src_col).cast("long").alias("u"),
            F.col(dst_col).cast("long").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
    )
    e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # ``distinct_bipartite_input``: the caller guarantees the edge list is
    # already distinct AND src/dst draw from disjoint id spaces — then the
    # symmetrized union cannot contain duplicates and the initial
    # corpus-wide dedup exchange is pure waste. (The per-round resym
    # distincts below always run: they ARE the contraction.)
    if not distinct_bipartite_input:
        e = e.distinct()
    e, prev = checkpoint_with_checksum(e)
    edges_per_round: list[int] = [prev[0]]

    # scale-adaptive loop partitioning (guide §2): per-round shuffle
    # width sized from the OBSERVED edge count (already collected for
    # the convergence checksum), never wider than the session setting;
    # restored in the finally below. The readout DataFrame returned to
    # the caller plans its exchanges at action time, after the restore.
    sess = edges.sparkSession
    _saved_parts: str | None = None
    if _cc_adaptive_parts():
        try:
            _saved_parts = sess.conf.get("spark.sql.shuffle.partitions")
            int(_saved_parts)
        except Exception:
            _saved_parts = None

    def _tune_parts(n_edges: int) -> None:
        if _saved_parts is None:
            return
        want = max(1, (n_edges + _CC_EDGES_PER_PART - 1) // _CC_EDGES_PER_PART)
        sess.conf.set(
            "spark.sql.shuffle.partitions",
            str(min(int(_saved_parts), want)),
        )

    def nmin(ed):
        return (
            ed.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
        )

    def resym(ed):
        ed = ed.where(F.col("u") != F.col("v"))
        return ed.union(
            ed.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()

    import time as _time

    round_secs: list[float] = []
    retired_parts: list[DataFrame] = []  # materialized (node, parent) batches
    retired_per_round: list[int] = []
    pinned: DataFrame | None = None  # distinct retirement targets (never retire)

    def readout(residual_labels: DataFrame) -> DataFrame:
        """(node, cluster_rep) for the whole ORIGINAL node set: residual
        labels, plus pinned targets that lost every edge (they are their
        own component minima — everything removed from them was a larger
        leaf), plus each retired node resolved through its pinned parent
        in one join."""
        out = residual_labels
        if retired_parts:
            roots = (
                pinned.join(
                    residual_labels.select(F.col("node").alias("_rn")),
                    F.col("p") == F.col("_rn"),
                    "left_anti",
                )
                .select(F.col("p").alias("node"), F.col("p").alias("cluster_rep"))
            )
            base = residual_labels.union(roots)
            retired_all = retired_parts[0]
            for part in retired_parts[1:]:
                retired_all = retired_all.union(part)
            resolved = (
                retired_all.join(
                    base.select(
                        F.col("node").alias("parent"),
                        F.col("cluster_rep").alias("_rep"),
                    ),
                    "parent",
                )
                .select("node", F.col("_rep").alias("cluster_rep"))
            )
            out = base.union(resolved)
        return out

    def checkpoint_with_count(df):
        obs = Observation()
        out = cut_lineage(
            df.observe(obs, F.count(F.lit(1)).alias("n")), reliable=reliable
        )
        return out, obs.get["n"]

    try:
        for rnd in range(1, max_iter + 1):
            _t0 = _time.perf_counter()
            _tune_parts(prev[0])
            # one aggregate serves the retirement rule AND the large-star
            # minimum: deleting a retired leaf changes nobody else's closed-
            # neighborhood min (the leaf is larger than its only neighbor),
            # so m computed pre-prune stays valid post-prune.
            agg = e.groupBy("u").agg(
                F.min("v").alias("mv"), F.count(F.lit(1)).alias("d")
            )
            if frontier and rnd >= 2 and prev[0] >= frontier_min_edges:
                cand = agg.where(
                    (F.col("d") == 1) & (F.col("mv") < F.col("u"))
                ).select(F.col("u").alias("node"), F.col("mv").alias("parent"))
                if pinned is not None:
                    cand = cand.join(
                        pinned, F.col("node") == F.col("p"), "left_anti"
                    )
                cand, n_ret = checkpoint_with_count(cand)
                if n_ret >= frontier_min_retire_frac * prev[0]:
                    rc = cand.select(F.col("node").alias("rn"))
                    e = (
                        e.join(rc, F.col("u") == F.col("rn"), "left_anti")
                        .join(rc, F.col("v") == F.col("rn"), "left_anti")
                    )
                    agg = agg.join(rc, F.col("u") == F.col("rn"), "left_anti")
                    retired_parts.append(cand)
                    newly_pinned = cand.select(
                        F.col("parent").alias("p")
                    ).distinct()
                    pinned = (
                        newly_pinned if pinned is None
                        else pinned.union(newly_pinned).distinct()
                    )
                    retired_per_round.append(n_ret)
                else:
                    retired_per_round.append(0)
            m = agg.select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
            large = (
                e.join(m, "u")
                .where(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
            )
            # the large-star edge set must be MATERIALIZED once per round (it
            # feeds resym's two branches plus the small-star min and join);
            # lazily checkpointing it folds that materialization into the
            # small-star checkpoint's job — one driver/job round-trip per CC
            # round instead of two (r17, guide §1.2 per-round fixed cost)
            e = cut_lineage(
                resym(large.union(m.select("u", F.col("m").alias("v")))),
                reliable=reliable,
                eager=not _cc_midcut_lazy(),
            )
            m = nmin(e)
            small = (
                e.join(m, "u")
                .where(F.col("v") < F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
            )
            e, cur = checkpoint_with_checksum(
                resym(small.union(m.select("u", F.col("m").alias("v"))))
            )
            edges_per_round.append(cur[0])
            round_secs.append(round(_time.perf_counter() - _t0, 3))
            # an EMPTY edge set is a fixed point by itself — converge now
            # rather than paying a confirmation round (mass retirement can
            # empty the graph mid-loop)
            if cur == prev or cur[0] == 0:
                if stats is not None:
                    stats["rounds"] = rnd
                    stats["edges_per_round"] = edges_per_round
                    stats["round_secs"] = round_secs
                    if frontier:
                        stats["retired_per_round"] = retired_per_round
                final = nmin(e).select(
                    F.col("u").alias("node"), F.col("m").alias("cluster_rep")
                )
                return readout(final)
            prev = cur
        raise RuntimeError(
            f"connected_components_two_phase did not converge in {max_iter} rounds"
        )
    finally:
        # restore the session's shuffle width even on a mid-loop failure
        if _saved_parts is not None:
            sess.conf.set("spark.sql.shuffle.partitions", _saved_parts)

