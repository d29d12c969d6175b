"""The regexp-based shingle builder (round-8 HOF-tax fix) must emit the
exact multiset of token n-grams the split-token definition implies —
including whitespace edge cases and arbitrary n — and the staged
language-ID projection must keep the oracle's argmax/tie-break."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ska_src_maltopuft_etl_spark.operators.similarity import ngram_shingles
from ska_src_maltopuft_etl_spark.operators.text import language_scores

# Texts drawn from a tiny alphabet with weird spacing: leading/trailing
# spaces, runs of spaces, tokens containing regex metacharacters.
word = st.sampled_from(["the", "a", "b.c", "x*", "(y)", "zz"])
text_st = st.lists(
    st.one_of(word, st.just(" ")), min_size=0, max_size=12
).map(lambda parts: " ".join(parts))


def py_grams(text: str, n: int) -> list[str]:
    toks = [w for w in text.split(" ") if w != ""]
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(text_st, min_size=1, max_size=8), n=st.integers(2, 4))
def test_shingles_match_token_definition(spark, texts, n):
    d = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["shingle"])
        for r in ngram_shingles(
            d, "doc_id", "text", n=n, distinct=False
        ).collect()
    )
    want = sorted(
        (i, g) for i, t in enumerate(texts) for g in py_grams(t, n)
    )
    assert got == want


def test_shingles_edge_whitespace(spark):
    d = spark.createDataFrame(
        [
            (1, "  a b  c d "),  # leading/double/trailing spaces
            (2, "a b"),  # exactly n-1 tokens for n=3
            (3, ""),
            (4, "a b c"),
            # only ' ' is a separator: the newline stays inside a token
            (5, "a\nb c d"),
        ],
        "doc_id long, text string",
    )
    rows = ngram_shingles(d, "doc_id", "text", n=3).collect()
    got = sorted((r["doc_id"], r["shingle"]) for r in rows)
    assert got == [
        (1, "a b c"),
        (1, "b c d"),
        (4, "a b c"),
        (5, "a\nb c d"),
    ]


def test_language_scores_argmax_tiebreak(spark):
    markers = {"en": ["the", "a"], "de": ["table", "batch"]}
    d = spark.createDataFrame(
        [
            (1, "the the table"),  # en wins 2-1
            (2, "the table"),  # tie 1-1 -> lexicographically first (de)
            (3, "nothing here"),  # no hits -> unknown
            (4, ""),
            (5, "a the batch table table"),  # de wins 3-2
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["pred_lang"], r["marker_hits"])
        for r in language_scores(d, "doc_id", "text", markers).collect()
    }
    assert got == {
        1: ("en", 2),
        2: ("de", 1),
        3: ("unknown", 0),
        4: ("unknown", 0),
        5: ("de", 3),
    }
