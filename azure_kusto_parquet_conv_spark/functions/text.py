"""Text-analysis expression builders for the LLM-pipeline operators.

All pure JVM-side Column builders (no Python row path): tokenization,
n-gram shingles, quality metrics, language-ID heuristic, fingerprints.
These feed the dedup operators (operators/dedup.py) and the text-analysis
queries; the reference has no text surface (SURVEY.md §2.4), this is the
mandated extension layer.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Minimal per-language stopword lists for the n-gram/stopword heuristic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "que", "en", "por"],
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize(c: Column | str) -> Column:
    """Lowercase, trim, collapse whitespace runs — canonical text form."""
    return F.regexp_replace(F.trim(F.lower(_col(c))), r"\s+", " ")


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization of normalized text -> array<string>."""
    return F.split(normalize(c), " ")


def word_bigrams(c: Column | str) -> Column:
    """Adjacent-token bigrams ("tok[i] tok[i+1]") of normalized text as
    array<string> — empty for docs with < 2 tokens. zip_with over the
    two shifted slices visits each element ONCE. (The first version
    used element_at(toks, i+2) inside a transform lambda — Catalyst
    inlines the whole normalize+split tree into the lambda body, so
    every element re-tokenized the document: O(tokens^2) per row,
    measured 8.4 s for the repetition-signal scan at sf0.1 vs 0.7 s
    for this shape.)"""
    toks = tokens(c)
    n = F.size(toks)
    return F.zip_with(F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1),
                      lambda a, b: F.concat_ws(" ", a, b))


def max_run_length(arr: Column) -> Column:
    """Length of the longest run of equal adjacent elements after
    sorting ``arr`` — i.e. the multiplicity of the array's MODE, without
    exploding (sorting puts equal values adjacent, so the longest run is
    the highest count). O(n log n) per row inside the JVM; 0 for empty
    arrays. The accumulator seed uses "" as the not-a-value sentinel
    (sorted grams are non-empty strings, so the first element always
    starts a fresh run)."""
    zero = F.lit(0).cast("long")
    acc0 = F.struct(F.lit("").alias("prev"),
                    zero.alias("run"), zero.alias("best"))

    def step(acc, x):
        run = (F.when(x == acc["prev"], acc["run"] + 1)
                .otherwise(F.lit(1).cast("long")))
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(acc["best"], run).alias("best"))

    return F.aggregate(F.array_sort(arr), acc0, step,
                       lambda acc: acc["best"])


def collapse_repeats(c: Column | str) -> Column:
    """Tokens of normalized text with runs of consecutive equal tokens
    collapsed to one occurrence ("a a a b a" -> [a, b, a]) — the
    looping-text cleanup companion to the repetition signals. Built
    from the same shifted-slice trick as word_bigrams (each element
    visited once; no element_at-in-lambda re-evaluation): zip each
    token with its predecessor into (token, is-run-start) structs,
    filter to run starts, project the token back out."""
    toks = tokens(c)
    n = F.size(toks)
    prev = F.concat(F.array(F.lit("")), F.slice(toks, 1, n - 1))
    z = F.zip_with(toks, prev,
                   lambda a, b: F.struct(a.alias("t"),
                                         (a != b).alias("k")))
    return F.transform(F.filter(z, lambda s: s["k"]), lambda s: s["t"])


def bpe_ish_tokens(c: Column | str) -> Column:
    """A BPE-ish regex tokenizer: words, numbers, and single punctuation
    marks as separate tokens (GPT-2-style pre-tokenization pattern,
    simplified to what java.util.regex supports)."""
    toks = F.regexp_extract_all(
        F.lower(_col(c)), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    return toks


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c))


def char_ngrams(c: Column | str, n: int = 3) -> Column:
    """Character n-gram shingles of the normalized text -> array<string>.

    Expressed with sequence+transform so it stays in codegen; empty/short
    strings yield an empty array.
    """
    def grams(s: Column) -> Column:
        ln = F.length(s)
        return F.when(ln < n, F.array().cast("array<string>")).otherwise(
            F.transform(F.sequence(F.lit(1), ln - (n - 1)),
                        lambda i: F.substring(s, i, n)))
    # bind the normalized string once (same rationale as token_ngrams:
    # inlining normalize() would re-run its regexes per gram position)
    return F.get(F.transform(F.array(normalize(c)), grams), 0)


def token_ngrams(c: Column | str, n: int = 3) -> Column:
    """Token n-gram shingles -> array<string> (space-joined).

    The token array is BOUND ONCE as a lambda variable (outer transform
    over a 1-element array): inlining ``tokens(c)`` directly into the
    per-position lambda would re-run the normalize+split regex for every
    gram position — measured ~50x slower at corpus scale."""
    def grams(t: Column) -> Column:
        sz = F.size(t)
        return F.when(sz < n, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), sz - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            ))
    return F.get(F.transform(F.array(tokens(c)), grams), 0)


def _isin_any(words: list[str]):
    """Unary-lambda factory (PySpark infers HOF arity from the signature,
    so default-arg tricks would turn this into an (element, index) lambda)."""
    return lambda x: x.isin(*words)


def stopword_ratio(c: Column | str, lang: str = "en") -> Column:
    t = tokens(c)
    matches = F.size(F.filter(t, _isin_any(STOPWORDS[lang])))
    return F.when(F.size(t) > 0, matches / F.size(t)).otherwise(F.lit(0.0))


def punct_ratio(c: Column | str) -> Column:
    s = _col(c)
    n_punct = F.length(s) - F.length(F.regexp_replace(s, r"[^\w\s]", ""))
    return F.when(F.length(s) > 0, n_punct / F.length(s)).otherwise(F.lit(0.0))


def mean_token_len(c: Column | str) -> Column:
    t = tokens(c)
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(F.size(t) > 0, total / F.size(t)).otherwise(F.lit(0.0))


def dup_token_frac(c: Column | str) -> Column:
    """Fraction of tokens that are repeats of an earlier token
    (1 - type/token ratio) — the cheapest repetition signal in the
    Gopher-style quality battery. 0.0 for empty docs."""
    t = tokens(c)
    return F.when(
        F.size(t) > 0,
        F.round(1.0 - F.size(F.array_distinct(t)) / F.size(t), 4),
    ).otherwise(F.lit(0.0))


def dup_ngram_frac(c: Column | str, n: int = 3) -> Column:
    """Fraction of token n-grams that are duplicates of an earlier
    n-gram: catches templated / looping text that token-level
    repetition misses. 0.0 when the doc has fewer than ``n`` tokens."""
    g = token_ngrams(c, n)
    return F.when(
        F.size(g) > 0,
        F.round(1.0 - F.size(F.array_distinct(g)) / F.size(g), 4),
    ).otherwise(F.lit(0.0))


def quality_score(c: Column | str) -> Column:
    """Heuristic document quality in [0,1]: balanced length, word-like
    tokens, low punctuation noise — the standard cheap pre-filter shape
    used in LLM data pipelines (length/punct/stopword ratios)."""
    n_tok = token_count(c)
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    mtl = mean_token_len(c)
    shape_score = F.when((mtl >= 2.0) & (mtl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.3))
    punct_score = F.lit(1.0) - F.least(punct_ratio(c) * 4, F.lit(1.0))
    return F.round(len_score * 0.4 + shape_score * 0.4 + punct_score * 0.2, 4)


def lang_id(c: Column | str) -> Column:
    """Stopword-vote language ID over {en,de,fr,es}; 'und' (undetermined)
    when nothing matches. Pure expression: per-language match counts via
    array filters, argmax via greatest + chained whens."""
    t = tokens(c)
    counts = {
        lang: F.size(F.filter(t, _isin_any(words)))
        for lang, words in STOPWORDS.items()
    }
    best = F.greatest(*counts.values())
    out = F.lit("und")
    # reversed so earlier languages win ties (deterministic order)
    for lang in reversed(list(counts)):
        out = F.when((best > 0) & (counts[lang] == best), F.lit(lang)).otherwise(out)
    return out


def fingerprint_md5(c: Column | str) -> Column:
    """Content fingerprint: md5 of normalized text. Deterministic and
    portable (DuckDB md5 matches), used as the exact-dedup key."""
    return F.md5(normalize(c))


def fingerprint_rolling(c: Column | str, base: int = 31,
                        mod: int = (1 << 31) - 1) -> Column:
    """Polynomial rolling hash over tokens (Rabin-Karp style), bounded with
    pmod so it is ANSI-overflow-safe: acc = (acc*base + xxhash64(tok)) % mod."""
    return F.aggregate(
        tokens(c),
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * base + F.pmod(F.xxhash64(x), mod), mod),
    )


# PII patterns shared by the Spark op and its DuckDB oracle: kept to the
# regex subset Java and RE2 agree on (char classes, bounded repeats, \b).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"(?:\(\d{3}\)|\b\d{3})[ -]\d{3}[ -]\d{4}\b", "<PHONE>"),
    (r"\b\d(?:[ -]?\d){12,15}\b", "<CARD>"),
]


def redact_pii(c: Column | str) -> Column:
    """Scrub emails / SSNs / phone numbers / card-like digit runs to
    typed placeholders — the standard pre-training privacy pass. A chain
    of JVM regexp_replace calls (one scan per pattern, whole-stage
    codegen; order matters: SSN/phone run before the broad digit-run
    card pattern so they win their shapes)."""
    out = _col(c)
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_match_count(c: Column | str) -> Column:
    """How many PII spans redact_pii would replace (audit metric)."""
    out = _col(c)
    total = F.lit(0)
    for pat, _ in PII_PATTERNS:
        total = total + F.size(F.regexp_extract_all(out, F.lit(pat), F.lit(0)))
        # blank matched spans (with a separator, so adjacent digits can't
        # fuse into a fresh match) to avoid double-counting overlaps
        out = F.regexp_replace(out, pat, " ")
    return total


#: query parameters stripped by normalize_url — the standard tracking
#: params that fragment otherwise-identical URLs in a web corpus.
#: Matched case-insensitively ('UTM_SOURCE=' is still tracking).
#: Deliberately NOT including 'ref': on many sites ref is a content
#: parameter (branch/page selector), and stripping it would collapse
#: genuinely distinct URLs onto one dedup key.
_TRACKING_RE = r"(?i)^(utm_[a-z0-9_]+|gclid|fbclid|msclkid)="


def normalize_url(c: Column | str,
                  tracking_re: str = _TRACKING_RE) -> Column:
    """Canonical URL form for dedup/grouping: lowercase scheme+host,
    fragment dropped, tracking query parameters (utm_*, gclid, fbclid,
    msclkid — case-insensitive; override via ``tracking_re``) removed,
    remaining parameters SORTED, trailing path slashes stripped. Pure
    JVM expressions (parse_url + array ops, whole-stage codegen) — the
    URL-level dedup key of a web-corpus pipeline, where utm-fragmented
    duplicates dominate raw-URL counts."""
    u = _col(c)
    scheme = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    path = F.regexp_replace(
        F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit("")), "/+$", "")
    q = F.coalesce(F.parse_url(u, F.lit("QUERY")), F.lit(""))
    kept = F.array_sort(F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(tracking_re)))
    qs = F.array_join(kept, "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")))
