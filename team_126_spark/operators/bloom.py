"""Distributed Bloom-filter membership: the constant-space alternative to
an equi-join when the question is only "was this key in that corpus?" —
train/eval decontamination screens, URL-seen filters, cross-corpus overlap
probes at 100 TB, where shipping the full key set to every probe task (or
shuffling both sides) is the expensive part.

Design for Spark's execution model:
  - the filter is a TABLE of (word_idx, word) rows — m_bits/32 rows total
    (a few KB for m = 2^15..2^20) built with one groupBy(bit_or) over the
    keys' exploded bit positions; it broadcasts to every probe task, so the
    probe side is a map-only broadcast join: NO shuffle of the probed
    corpus, the asymmetry that makes this the scale path.
  - bit positions are md5-derived (functions/text.md5_low60 of "key:j"),
    so the WHOLE structure — every set bit, every probe verdict including
    the false positives — is deterministic and has an exact DuckDB twin
    (declared query `bloom_decontaminate`); no sketch-library opacity.
  - 32 bits per 64-bit word keep every mask positive in BOTH engines
    (1 << 31 max), sidestepping signed-shift overflow differences.

False-positive rate is the standard (1 - e^{-k n / m})^k; no false
negatives ever (property-tested). Size m at ~10 bits/key for ~1% FP with
k=4; the builder does NOT auto-size (an operator that silently resizes
produces irreproducible filters across corpus growth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_low60

BITS_PER_WORD = 32


def _bit_positions(key, m_bits: int, k: int) -> list:
    """k deterministic bit positions for a key: md5_low60("key:j") % m."""
    return [
        md5_low60(F.concat(key.cast("string"), F.lit(f":{j}"))) % m_bits
        for j in range(k)
    ]


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 15, k: int = 4
) -> DataFrame:
    """Build the filter table (word_idx, word, m_bits, k) over df[key_col].

    One explode (k slim rows per key) + one groupBy(bit_or) shuffle on the
    word index — at most m_bits/32 groups regardless of corpus size, so the
    reduce side is trivially small. NULL keys contribute nothing.

    The sizing parameters ride along as constant columns: a probe computed
    with DIFFERENT m_bits/k than the build produces silent FALSE NEGATIVES
    (bits land in other words), the one failure mode a Bloom filter must
    never have — so bloom_probe reads the parameters off the table and
    refuses a mismatch instead of trusting the call site.
    """
    if m_bits % BITS_PER_WORD:
        raise ValueError(f"m_bits must be a multiple of {BITS_PER_WORD}")
    key = F.col(key_col)
    pos = F.explode(F.array(*_bit_positions(key, m_bits, k))).alias("p")
    sel = df.filter(key.isNotNull()).select(pos)
    # shiftleft's Python binding takes only a literal shift amount, so the
    # data-dependent bit mask goes through the SQL form
    mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {BITS_PER_WORD} AS INT))")
    return (
        sel.groupBy(F.shiftright(F.col("p"), 5).alias("word_idx"))
        .agg(F.bit_or(mask).alias("word"))
        .withColumn("m_bits", F.lit(int(m_bits)))
        .withColumn("k", F.lit(int(k)))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int | None = None,
    k: int | None = None,
    out: str = "maybe_member",
) -> DataFrame:
    """Append `out`: True iff ALL k of the key's bits are set in `bloom`
    (so: definitely-absent keys get False — no false negatives; a small
    deterministic fraction of absent keys get True).

    Sizing defaults to the parameters EMBEDDED in the filter table by
    bloom_build (one bounded first() over the ≤ m/32-row table); passing
    them explicitly is allowed but a mismatch with the embedded values
    raises — probing with the wrong geometry produces silent false
    negatives, the one thing this structure promises never to do.

    Plan: explode the k probe positions, broadcast-join the filter table,
    bool_and per key, join the verdict back. The probed corpus shuffles
    once on its own key (the verdict re-attach); the filter never shuffles
    anything at probe time. NULL keys probe False.
    """
    if "m_bits" in bloom.columns and "k" in bloom.columns:
        params = bloom.select("m_bits", "k").first()
        if params is not None:
            bm, bk = int(params["m_bits"]), int(params["k"])
            if m_bits is not None and m_bits != bm:
                raise ValueError(
                    f"bloom_probe: m_bits={m_bits} != filter's m_bits={bm} — "
                    f"mismatched geometry would yield silent false negatives"
                )
            if k is not None and k != bk:
                raise ValueError(
                    f"bloom_probe: k={k} != filter's k={bk} — mismatched "
                    f"geometry would yield silent false negatives"
                )
            m_bits, k = bm, bk
        bloom = bloom.drop("m_bits", "k")
    if m_bits is None or k is None:
        raise ValueError(
            "bloom_probe: filter table has no embedded parameters; pass "
            "m_bits and k explicitly (matching the build)"
        )
    key = F.col(key_col)
    probes = df.select(key.alias("_bk")).where(key.isNotNull()).distinct()
    pos = F.explode(F.array(*_bit_positions(F.col("_bk"), m_bits, k))).alias("p")
    exploded = probes.select("_bk", pos).select(
        "_bk",
        F.shiftright(F.col("p"), 5).alias("word_idx"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {BITS_PER_WORD} AS INT))").alias(
            "_mask"
        ),
    )
    hit = F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("_mask")) == F.col("_mask")
    verdict = (
        exploded.join(F.broadcast(bloom), "word_idx", "left")
        .select("_bk", hit.alias("_hit"))
        .groupBy("_bk")
        .agg(F.bool_and("_hit").alias(out))
    )
    return df.join(verdict, key == F.col("_bk"), "left").drop("_bk").withColumn(
        out, F.coalesce(F.col(out), F.lit(False))
    )


# ---------------------------------------------------------------------------
# Count-min sketch: frequency estimation in constant space
# ---------------------------------------------------------------------------


def countmin_build(
    df: DataFrame, key_col: str, width: int = 256, depth: int = 4
) -> DataFrame:
    """Build a count-min sketch table (j, bucket, n, width, depth) over
    df[key_col] — the constant-space frequency summary (Cormode &
    Muthukrishnan 2005) for heavy-hitter estimation when an exact
    per-key count would shuffle every distinct key at 100 TB.

    Plan shape: one map-only explode (depth slim rows per input row)
    feeding straight into a partially-aggregated groupBy(j, bucket) —
    the shuffle carries at most depth×width counter rows PER MAP
    PARTITION regardless of corpus size, and sketches from disjoint
    corpus shards merge by plain addition (the mergeability that makes
    this the streaming/partitioned shape). Bucket hashes are md5-derived
    (functions/text.md5_low60 of "cm{j}:{key}"), so every counter — and
    therefore every estimate — is deterministic with an exact DuckDB
    twin (declared query `countmin_freq`); no sketch-library opacity.

    Guarantee: estimate >= true count always (never under), and
    estimate <= true + (e/width)·N with probability 1 - e^{-depth}.
    NULL keys contribute nothing.
    """
    key = F.col(key_col).cast("string")
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (md5_low60(F.concat(F.lit(f"cm{j}:"), key)) % width).alias(
                    "bucket"
                ),
            )
            for j in range(depth)
        ]
    )
    ex = df.where(F.col(key_col).isNotNull()).select(F.explode(rows).alias("h"))
    return (
        ex.groupBy(F.col("h.j").alias("j"), F.col("h.bucket").alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .withColumn("width", F.lit(width))
        .withColumn("depth", F.lit(depth))
    )


def countmin_estimate(
    probes: DataFrame,
    sketch: DataFrame,
    key_col: str,
    out: str = "cm_est",
) -> DataFrame:
    """Append `out`: the count-min point estimate min_j sketch[j][h_j(key)]
    for each probe row's key. Geometry (width/depth) is read off the
    sketch table (one bounded first() over the ≤ depth×width-row table) —
    estimating with mismatched geometry probes the wrong buckets and
    breaks the no-underestimate guarantee, so it cannot be overridden.

    Plan: explode depth probe positions per key, LEFT-broadcast-join the
    sketch (a bucket no key ever hit is absent from the table → COALESCE
    0), min per key, join the estimate back onto the probe rows. The
    probe side shuffles once on its own key; the sketch never shuffles.

    NULL-key contract (both sketch paths, pinned by test): a NULL probe
    key gets a NULL estimate — populated sketches via the NULL-never-
    equi-joins final left join, empty sketches via the otherwise-less
    CASE — because "frequency of no key" is undefined, matching
    countmin_build where NULL keys contribute nothing.
    """
    params = sketch.select("width", "depth").first()
    if params is None:
        # Empty-because-corpus-empty (the geometry columns resolve, there
        # are just no counter rows): every counter is 0, so the count-min
        # estimate is 0 for every key at ANY geometry — return the
        # well-formed zero estimate. A wrong table (missing width/depth)
        # still fails loudly above on schema resolution.
        return probes.withColumn(
            out,
            F.when(
                F.col(key_col).isNotNull(), F.lit(0).cast("bigint")
            ),
        )
    width, depth = int(params["width"]), int(params["depth"])
    sk = sketch.drop("width", "depth")
    keys = probes.select(F.col(key_col).alias("_ck")).where(
        F.col(key_col).isNotNull()
    ).distinct()
    exploded = keys.select(
        "_ck",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (
                            md5_low60(
                                F.concat(F.lit(f"cm{j}:"), F.col("_ck").cast("string"))
                            )
                            % width
                        ).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("h"),
    ).select("_ck", "h.j", "h.bucket")
    est = (
        exploded.join(F.broadcast(sk), ["j", "bucket"], "left")
        .groupBy("_ck")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).cast("bigint").alias(out))
    )
    return probes.join(
        est, probes[key_col] == est["_ck"], "left"
    ).drop("_ck")
