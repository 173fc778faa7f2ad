"""Text-analysis column functions for large-scale training-data pipelines.

Language ID (stopword-overlap heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting. Everything is a
JVM-side column expression (regex, array ops, md5) — no Python in the hot
path, so these run inside whole-stage codegen over 100 TB of documents.

The NER-style query templating the reference planned (``NER-Explanation.txt:
4-6`` — "how to install APPLICATION in OS") is the same shape: dictionary/
regex placeholder substitution as a column expression; see
``template_placeholders``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish pre-tokenizer: letter runs, single digits, single punctuation.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

#: Tiny high-frequency stopword lists per language (public common words).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "for", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr": ("le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokens of lower(trim(text)); empty array for blank text."""
    t = F.lower(F.trim(text))
    return F.when(F.length(t) > 0, F.split(t, r"\s+")).otherwise(
        F.array().cast("array<string>")
    )


def whitespace_token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens — a cheap proxy for LLM token counts."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN)).cast("long")


def punct_ratio(text: Column) -> Column:
    """Non-alphanumeric-non-space chars / total chars (0 for empty)."""
    n = F.length(text)
    punct = F.regexp_count(text, F.lit(r"[^A-Za-z0-9\s]")).cast("double")
    return F.when(n > 0, punct / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Distinct stopwords present / distinct tokens (0 for empty)."""
    toks = F.array_distinct(tokens(text))
    hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks).cast("double")).otherwise(
        F.lit(0.0)
    )


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks).cast("double")).otherwise(
        F.lit(0.0)
    )


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality score (length + word-shape + punctuation).

    score = 0.4·min(1, n_chars/200) + 0.3·clamp((mwl-2)/6) + 0.3·(1-min(1, 4·punct)).
    Deterministic closed form → oracle-checkable in any SQL engine.
    """
    len_term = F.least(F.lit(1.0), F.length(text).cast("double") / F.lit(200.0))
    mwl = mean_word_length(text)
    shape_term = F.greatest(
        F.lit(0.0), F.least(F.lit(1.0), (mwl - F.lit(2.0)) / F.lit(6.0))
    )
    punct_term = F.lit(1.0) - F.least(F.lit(1.0), F.lit(4.0) * punct_ratio(text))
    return (
        F.lit(0.4) * len_term + F.lit(0.3) * shape_term + F.lit(0.3) * punct_term
    )


def language_id(text: Column) -> Column:
    """Pick the language whose stopword list overlaps most (ties → lang asc,
    zero overlap everywhere → 'und')."""
    toks = F.array_distinct(tokens(text))
    scored = [
        F.struct(
            F.size(
                F.array_intersect(
                    toks, F.array(*[F.lit(w) for w in STOPWORDS[lang]])
                )
            ).alias("score"),
            # negate nothing: to make max_by prefer lexicographically SMALLER
            # lang on ties, sort key is (score, reversed-lang) — instead use
            # explicit fold below for clarity.
            F.lit(lang).alias("lang"),
        )
        for lang in sorted(STOPWORDS)
    ]
    arr = F.array(*scored)
    best = F.aggregate(
        arr,
        F.struct(F.lit(-1).alias("score"), F.lit("und").alias("lang")),
        lambda acc, s: F.when(s["score"] > acc["score"], s).otherwise(acc),
    )
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def char_shingles(text: Column, n: int = 5) -> Column:
    """Distinct character n-grams of lower(trim(text)); empty if len < n."""
    t = F.lower(F.trim(text))
    starts = F.sequence(F.lit(1), F.length(t) - F.lit(n - 1))
    return F.when(
        F.length(t) >= n,
        F.array_distinct(F.transform(starts, lambda i: t.substr(i, F.lit(n)))),
    ).otherwise(F.array().cast("array<string>"))


def doc_fingerprint(text: Column) -> Column:
    """md5 of the normalized text — exact-dup fingerprint, engine-portable."""
    return F.md5(F.lower(F.trim(text)))


def shingle_fingerprint(text: Column, n: int = 5) -> Column:
    """Min md5 over character n-gram shingles — a 1-permutation MinHash that
    is stable across engines (md5 hex compares identically everywhere).

    Column form (array lambda → interpreted); for corpus-scale use the
    codegen'd bulk form ``shingle_fingerprints`` — same values.
    """
    hashes = F.transform(char_shingles(text, n), F.md5)
    return F.when(F.size(hashes) > 0, F.array_min(hashes)).otherwise(
        F.md5(F.lower(F.trim(text)))
    )


def shingle_fingerprints(df, id_col: str, text_col: str, n: int = 5):
    """Bulk (id, fp, shingle_fp) — codegen formulation of the fingerprints.

    Explodes shingle positions (min over a multiset of md5s equals min over
    the set, so no distinct pass is needed) and folds with a map-side
    combining MIN aggregate; only (id, 32-char digest) rows shuffle.
    """
    # The shingle pass is CPU-bound (one md5 per character position); a
    # compacted input (few parquet row groups) would serialize it on a
    # handful of tasks — spread it when the source has fewer partitions
    # than cores (no-op at real scale where inputs have thousands).
    default_par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < default_par:
        df = df.repartition(default_par)
    t = F.lower(F.trim(F.col(text_col)))
    base = df.select(F.col(id_col), F.md5(t).alias("fp"), t.alias("_t"))
    sh = (
        base.where(F.length("_t") >= n)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), F.length("_t") - F.lit(n - 1))).alias("_i"),
            "_t",
        )
        .select(F.col(id_col), F.md5(F.col("_t").substr(F.col("_i"), F.lit(n))).alias("h"))
        .groupBy(id_col)
        .agg(F.min("h").alias("shingle_fp"))
    )
    return (
        base.join(sh, id_col, "left")
        .select(
            F.col(id_col),
            "fp",
            F.coalesce(F.col("shingle_fp"), F.col("fp")).alias("shingle_fp"),
        )
    )


def template_placeholders(text: Column, dictionary: dict[str, list[str]]) -> Column:
    """NER-style templating: replace dictionary terms with PLACEHOLDER tokens.

    ``dictionary`` maps placeholder → surface forms, e.g.
    ``{"OS": ["windows", "ubuntu"], "APPLICATION": ["docker", "chrome"]}``;
    longest surface forms are substituted first so overlaps resolve
    deterministically. Word-boundary regex, case-insensitive.
    """
    out = text
    pairs = [
        (placeholder, term)
        for placeholder, terms in sorted(dictionary.items())
        for term in terms
    ]
    for placeholder, term in sorted(pairs, key=lambda p: (-len(p[1]), p[0], p[1])):
        import re

        out = F.regexp_replace(out, f"(?i)\\b{re.escape(term)}\\b", placeholder)
    return out


def word_ngram_counts(df, text_col: str = "text", n: int = 2, k: int = 50):
    """Corpus-wide top-k word n-grams with counts — (ngram, n_occurrences).

    Explodes n-gram START positions over the whitespace token array and
    builds each n-gram with ``element_at`` + ``concat_ws`` — plain codegen
    expressions, no array-lambda HOFs in the corpus pass. The count is a
    map-side-combining aggregate, so only (ngram, partial count) rows cross
    the shuffle; the top-k is a total order (count desc, then ``md5`` of
    the n-gram — unique per group AND collation-proof across engines, so
    LIMIT selects the same rows under any string collation).
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return (
        df.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(toks.alias("_t"))
        .where(F.size("_t") >= n)
        .select(
            F.col("_t"),
            F.explode(
                F.sequence(F.lit(1), F.size("_t") - F.lit(n - 1))
            ).alias("_i"),
        )
        .select(
            F.concat_ws(
                " ",
                *[
                    F.element_at(F.col("_t"), F.col("_i") + F.lit(j))
                    for j in range(n)
                ],
            ).alias("ngram")
        )
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(
            F.col("n_occurrences").desc(),
            F.md5(F.encode(F.col("ngram"), "UTF-8")),
        )
        .limit(k)
    )


def repetition_stats(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document repetition metrics — the Gopher-style repetition filters
    (duplicated-word and duplicated-bigram share) used to drop template/spam
    documents from training corpora.

    Output: (id, n_words, dup_word_ratio, dup_bigram_ratio) where
    dup_X_ratio = 1 − distinct(X)/total(X) in [0, 1] (bigram ratio is 0 for
    single-word docs). Formulated as explode → map-side-combining
    count/count-distinct aggregates keyed by document id — no array-lambda
    HOFs in the corpus pass; only (id, token) rows reach the shuffle and
    the per-id partial aggregation collapses them early.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = (
        df.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), toks.alias("_t"))
    )
    words = (
        base.select(F.col(id_col), F.explode("_t").alias("w"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.countDistinct("w").alias("_ndw"),
        )
    )
    bigrams = (
        base.where(F.size("_t") >= 2)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), F.size("_t") - F.lit(1))).alias("_i"),
            "_t",
        )
        .select(
            F.col(id_col),
            F.concat_ws(
                " ",
                F.element_at(F.col("_t"), F.col("_i")),
                F.element_at(F.col("_t"), F.col("_i") + F.lit(1)),
            ).alias("bg"),
        )
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_nb"), F.countDistinct("bg").alias("_ndb"))
    )
    from batch_processing_pipeline_spark.functions.rounding import round4

    return (
        words.join(bigrams, id_col, "left")
        .select(
            F.col(id_col),
            "n_words",
            round4(
                F.lit(1.0)
                - F.col("_ndw").cast("double") / F.col("n_words").cast("double")
            ).alias("dup_word_ratio"),
            F.coalesce(
                round4(
                    F.lit(1.0)
                    - F.col("_ndb").cast("double") / F.col("_nb").cast("double")
                ),
                F.lit(0.0),
            ).alias("dup_bigram_ratio"),
        )
    )


#: HTML/XML tag (RE2-portable: no backrefs/lookahead - the pii.py
#: discipline, so a future DuckDB oracle can run the identical pattern)
_MARKUP_TAG = r"<[^>]{0,500}>"
#: VALUE-PRESERVING entities: each decodes to a character that no later
#: stage of the gate can re-interpret (quote marks, apostrophes, a bare
#: ampersand), so decoding them keeps the gate a fixpoint. ``&amp;`` is
#: deliberately LAST: decoding it earlier turns ``&amp;lt;`` into
#: ``&lt;`` in time for the ``&lt;`` rule to double-decode it to ``<``
#: (the exact non-idempotence the round-10 advice flagged).
_VALUE_ENTITIES = (
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)
#: MARKUP-SIGNIFICANT entities neutralize to a space instead of their
#: character. Decoding ``&lt;``/``&gt;`` to ``<``/``>`` would make a
#: SECOND cleaning pass see ``&lt;b&gt;`` output as a tag and erase the
#: text between (a re-crawled document would lose words), and ``&nbsp;``
#: to U+00A0 would survive the ``\s+`` collapse. A space preserves every
#: word boundary and is inert under all stages — the fixpoint choice.
#: The same pattern also catches entity literals RESURRECTED by the
#: ``&amp;`` decode (``&amp;nbsp;`` -> ``&nbsp;``), so double-encoded
#: entities neutralize instead of decoding twice. Entities outside this
#: table (``&eacute;`` ...) are left as literal text — already fixpoints.
_NEUTRAL_ENTITY = r"&(nbsp|lt|gt|quot|apos|amp|#39);"
#: invisible/control characters that survive scraping: C0 controls except
#: tab/newline/CR, DEL, zero-width space/joiners, BOM, soft hyphen
_INVISIBLE = (
    # escaped hex forms, NOT raw control bytes: the same pattern text
    # is valid Java regex (Spark) and RE2 (DuckDB), so the SQL twin
    # below can embed it verbatim
    "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f"
    "\\x{200b}-\\x{200d}\\x{feff}\\x{00ad}]"
)


def strip_markup(text: Column) -> Column:
    """Remove HTML/XML tags and decode/neutralize the common entities -
    the first gate of every web-scrape curation funnel. Tags become a
    single space (so ``a<br>b`` keeps its word boundary); then the
    value-preserving entity table decodes (``&amp;`` last — see the
    table comment); then numeric character references and the
    markup-significant entity set drop to a space. The neutralizer runs
    AFTER the ``&amp;`` decode so a resurrected literal (``&amp;lt;`` ->
    ``&lt;``, or the replace-all concatenation artifact ``&&amp;amp;``
    -> ``&&amp;``) is spaced out rather than left for a second pass to
    decode — the output contains nothing the gate itself would still
    transform. Pure ``regexp_replace`` chain: codegen, RE2-portable, no
    Python."""
    out = F.regexp_replace(text, _MARKUP_TAG, " ")
    for ent, repl in _VALUE_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(repl))
    # numeric refs: decimal and hex forms drop to a space (full decode
    # needs codepoint arithmetic - out of scope for a column chain; a
    # space preserves tokenization)
    out = F.regexp_replace(out, r"&#x?[0-9A-Fa-f]{1,6};", " ")
    out = F.regexp_replace(out, _NEUTRAL_ENTITY, " ")
    return out


def strip_invisible(text: Column) -> Column:
    """Drop control/zero-width/BOM/soft-hyphen characters that survive
    scraping and silently corrupt tokenization and dedup fingerprints
    (two visually identical documents with different zero-width padding
    hash apart)."""
    return F.regexp_replace(text, _INVISIBLE, "")


def collapse_whitespace(text: Column) -> Column:
    """Collapse all whitespace runs to single spaces and trim - the
    canonical form the dedup fingerprints and token counts assume."""
    return F.trim(F.regexp_replace(text, r"\s+", " "))


def clean_text(text: Column) -> Column:
    """The composed scrape-cleaning gate, a TRUE FIXPOINT:
    ``clean_text(clean_text(x)) == clean_text(x)`` for every input, so a
    re-crawled / re-run document keeps its dedup fingerprint (the whole
    reason the gate exists). Stage order is load-bearing:

    1. ``strip_invisible`` FIRST — a zero-width joiner inside a tag or
       entity (``<\\u200cb>``) otherwise reassembles into live markup
       only after the markup pass already ran;
    2. ``strip_markup`` — tags + entity decode/neutralize (see above);
    3. ``collapse_whitespace``;
    4. a SECOND tag strip + collapse: an over-500-char tag interior that
       the capped ``_MARKUP_TAG`` skipped can shrink under the cap once
       its entities/whitespace collapse (``<`` + 200×``&nbsp;`` + ``>``
       -> ``< >``); stripping again here means a second full pass finds
       nothing left to do.

    Every stage is a codegen regexp chain; the idempotency property is
    pinned in tests/test_text_analysis.py with adversarial atoms."""
    once = collapse_whitespace(strip_markup(strip_invisible(text)))
    return collapse_whitespace(F.regexp_replace(once, _MARKUP_TAG, " "))


def sql_clean_text(expr: str) -> str:
    """The identical cleaning chain as DuckDB SQL over ``expr`` — the
    pii.py ``sql_scrub_pii`` discipline: every pattern above is in the
    Java-regex ∩ RE2 subset, so the oracle engine can reproduce the
    cleaned string byte-for-byte (RE2 needs the explicit 'g' flag).
    Stage-for-stage mirror of ``clean_text`` including the fixpoint
    ordering (invisible first, value-entity decode with ``&amp;`` last,
    neutralizer, double tag strip)."""
    out = f"regexp_replace({expr}, '{_INVISIBLE}', '', 'g')"
    out = f"regexp_replace({out}, '{_MARKUP_TAG}', ' ', 'g')"
    for ent, repl in _VALUE_ENTITIES:
        e, r = ent.replace("'", "''"), repl.replace("'", "''")
        out = f"replace({out}, '{e}', '{r}')"
    out = f"regexp_replace({out}, '&#x?[0-9A-Fa-f]{{1,6}};', ' ', 'g')"
    out = f"regexp_replace({out}, '{_NEUTRAL_ENTITY}', ' ', 'g')"
    out = f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"
    out = f"regexp_replace({out}, '{_MARKUP_TAG}', ' ', 'g')"
    out = f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"
    return out
