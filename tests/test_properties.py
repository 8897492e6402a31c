"""Property-based tests (hypothesis) for the pure text kernels: the
invariants that must hold for ANY input, not just the fixtures — whitespace
canonicalization, tokenization identities, shingle counts, split totality.

Each example batches all generated strings into ONE DataFrame so a property
costs one Spark job, not one per string."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from team_126_spark.functions.text import md5_low60, tokens, word_shingles

# printable-ish text with lots of whitespace variety
texts = st.lists(
    st.text(
        alphabet=st.sampled_from(list("abcXYZ09 .!\t\n\r  ")),
        max_size=40,
    ),
    min_size=1,
    max_size=25,
)


def _df(spark, xs):
    return spark.createDataFrame([(i, x) for i, x in enumerate(xs)], ["i", "t"])


@settings(max_examples=5, deadline=None)
@given(texts)
def test_tokens_idempotent_and_clean(spark, xs):
    """Re-joining tokens and re-tokenizing is a fixpoint; no token is empty
    or contains whitespace; count matches array length."""
    df = _df(spark, xs).select(
        "i",
        tokens(F.col("t")).alias("tk"),
        tokens(F.array_join(tokens(F.col("t")), " ")).alias("tk2"),
    )
    for r in df.collect():
        assert r["tk"] == r["tk2"]
        assert all(tok and " " not in tok for tok in r["tk"])


@settings(max_examples=5, deadline=None)
@given(texts)
def test_shingle_count_bound(spark, xs):
    """<= max(0, n_tokens - k + 1) distinct shingles, each of exactly k
    whitespace-joined tokens."""
    k = 3
    df = _df(spark, xs).select(
        F.size(tokens(F.col("t"))).alias("n"),
        word_shingles(F.col("t"), k).alias("sh"),
    )
    for r in df.collect():
        assert len(r["sh"]) <= max(0, r["n"] - k + 1)
        assert all(len(s.split(" ")) == k for s in r["sh"])


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=30))
def test_md5_low60_range_and_determinism(spark, ids):
    df = spark.createDataFrame([(i,) for i in set(ids)], ["x"]).select(
        "x", md5_low60(F.col("x").cast("string")).alias("h")
    )
    rows = df.collect()
    assert all(0 <= r["h"] < 2**60 for r in rows)
    again = {r["x"]: r["h"] for r in df.collect()}
    assert {r["x"]: r["h"] for r in rows} == again
