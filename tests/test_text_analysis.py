"""Text-analysis functions: language ID, quality, tokens, templating."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_pipeline_spark.functions.text_analysis import (
    bpe_ish_token_count,
    doc_fingerprint,
    language_id,
    quality_score,
    template_placeholders,
    whitespace_token_count,
)


def test_language_id_on_real_sentences(spark):
    rows = [
        (0, "the cat sat on a mat and it is happy for now"),
        (1, "der hund ist nicht mit der katze und das ist gut"),
        (2, "el perro es un animal que vive en la casa con nosotros"),
        (3, "le chien est dans la maison et ce que pour un chat"),
        (4, "zzz qqq xxx"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r.lang for r in df.select("id", language_id(F.col("text")).alias("lang")).collect()}
    assert got == {0: "en", 1: "de", 2: "es", 3: "fr", 4: "und"}


def test_token_counts(spark):
    df = spark.createDataFrame([("Hello, world! 42 times",)], "text string")
    r = df.select(
        whitespace_token_count(F.col("text")).alias("ws"),
        bpe_ish_token_count(F.col("text")).alias("bpe"),
    ).collect()[0]
    assert r.ws == 4
    # Hello , world ! 4 2 times → 7 BPE-ish pretokens
    assert r.bpe == 7


def test_quality_score_ranks_prose_above_junk(spark):
    rows = [(0, "A well formed sentence with reasonable words and structure." * 4),
            (1, "!!! ??? ### $$$ %%% ^^^ &&&")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r.q for r in df.select("id", quality_score(F.col("text")).alias("q")).collect()}
    assert got[0] > 0.7
    assert got[1] < 0.5


def test_fingerprint_is_normalization_invariant(spark):
    df = spark.createDataFrame(
        [("  Hello World ",), ("hello world",)], "text string"
    )
    fps = [r.fp for r in df.select(doc_fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_template_placeholders_ner_style(spark):
    """The reference's planned NER templating (NER-Explanation.txt:4-6):
    'how to install docker in ubuntu' → 'how to install APPLICATION in OS'."""
    df = spark.createDataFrame([("how to install Docker in Ubuntu",)], "text string")
    out = df.select(
        template_placeholders(
            F.col("text"),
            {"OS": ["windows", "ubuntu"], "APPLICATION": ["docker", "chrome"]},
        ).alias("t")
    ).collect()[0].t
    assert out == "how to install APPLICATION in OS"


def test_bpe_learn_and_encode_golden(spark):
    """Classic BPE on a tiny corpus: merges come out in frequency order
    with lexicographic ties, and encoding applies them greedily."""
    from batch_processing_pipeline_spark.functions.bpe import (
        bpe_encode,
        encode_word,
        learn_bpe_merges,
    )

    df = spark.createDataFrame(
        [("aaab aaab aaab ab",)], "text string"
    )
    merges = learn_bpe_merges(df, "text", n_merges=2)
    # 'aa' appears 2x per 'aaab' x3 = 6; 'ab' appears 4 -> 'aa' first;
    # then words are [aa,a,b]x3 + [a,b]: pairs (aa,a)=3, (a,b)=4 -> 'ab'
    assert merges == [("a", "a"), ("a", "b")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("aaab", ranks) == ["aa", "ab"]
    assert encode_word("ab", ranks) == ["ab"]
    assert encode_word("xyz", ranks) == ["x", "y", "z"]

    enc = bpe_encode(df, merges)
    toks = enc.collect()[0].bpe_tokens
    assert toks == ["aa", "ab"] * 3 + ["ab"]


def test_bpe_encode_round_trips_and_is_deterministic(spark, sf_dir):
    """Concatenating a word's BPE tokens reconstructs the word, and two
    runs produce identical tokenizations (cache + tie-breaks stable)."""
    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.functions.bpe import (
        bpe_encode,
        learn_bpe_merges,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    merges = learn_bpe_merges(d, "text", n_merges=20)
    assert len(merges) == 20
    enc = bpe_encode(d.select("doc_id", "text"), merges)
    bad = enc.select(
        "doc_id",
        F.concat_ws("", "bpe_tokens").alias("glued"),
        F.concat_ws("", F.split(F.lower(F.trim("text")), r"\s+")).alias("orig"),
    ).where(F.col("glued") != F.col("orig"))
    assert bad.count() == 0
    a = {r.doc_id: r.bpe_tokens for r in enc.collect()}
    b = {r.doc_id: r.bpe_tokens for r in bpe_encode(d.select("doc_id", "text"), merges).collect()}
    assert a == b


def test_bpe_vocab_cap_bounds_collect_and_preserves_merges(spark, sf_dir):
    """``max_vocab`` bounds the driver collect (the 100-TB guard: the
    distinct-word relation of web text is not driver-sized). A cap at
    least as large as the fixture's true vocab must reproduce the
    uncapped merges exactly; a tight cap must still train (on the kept
    head) and stay deterministic."""
    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.functions.bpe import learn_bpe_merges

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    n_vocab = (
        d.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"))
        .where(F.length("w") >= 2)
        .select("w")
        .distinct()
        .count()
    )
    uncapped = learn_bpe_merges(d, "text", n_merges=10, max_vocab=None)
    roomy = learn_bpe_merges(d, "text", n_merges=10, max_vocab=n_vocab)
    assert uncapped == roomy
    tight = learn_bpe_merges(d, "text", n_merges=10, max_vocab=25)
    assert len(tight) == 10
    assert tight == learn_bpe_merges(d, "text", n_merges=10, max_vocab=25)


def test_compression_ratio_flags_repetitive_text(spark, tmp_path):
    """Repetitive text must compress far below varied text, and the
    signal must be deterministic across runs."""
    from batch_processing_pipeline_spark.registry import QUERIES

    docs = spark.createDataFrame(
        [
            (1, "spam " * 200),
            (2, "the quick brown fox jumps over the lazy dog and then "
                "wanders through seventeen distinct meadows full of unusual "
                "flowers while contemplating existential questions quietly"),
        ],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: r.comp_ratio
        for r in QUERIES["compression_ratio"](spark, str(tmp_path)).collect()
    }
    assert got[1] < 0.1 < got[2]
    again = {
        r.doc_id: r.comp_ratio
        for r in QUERIES["compression_ratio"](spark, str(tmp_path)).collect()
    }
    assert got == again


def test_clean_text_golden(spark):
    """Scrape-cleaning gate goldens: tags out (word boundaries kept),
    entities decoded, numeric refs spaced, zero-width/control/BOM/soft-
    hyphen stripped, whitespace collapsed."""
    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.functions.text_analysis import (
        clean_text,
        collapse_whitespace,
        strip_invisible,
        strip_markup,
    )

    cases = [
        ("<p>Hello <b>world</b></p>", "Hello world"),
        ("a<br>b", "a b"),
        # markup-significant entities neutralize to a space (fixpoint
        # design: decoding &lt; to '<' would let a SECOND pass see the
        # output as a tag and erase the text between — round-10 advice);
        # value entities (&amp; &quot;) still decode to their character
        ("Tom &amp; Jerry &lt;3 &quot;cats&quot;", 'Tom & Jerry 3 "cats"'),
        # double-encoded entities neutralize instead of double-decoding:
        # &amp;lt; -> &lt; (via &amp;-last ordering) -> ' ', never '<'
        ("x &amp;lt;y&amp;gt; z &amp;amp; w", "x y z w"),
        ("it&#39;s &#8212; fine", "it's fine"),
        # zero-width joiner inside a tag: invisible-strip runs FIRST so
        # the reassembled <b> is still caught by the markup pass
        ("a<‌b>c", "a c"),
        ("zero​width‍joined﻿!", "zerowidthjoined!"),
        ("soft­hyphen", "softhyphen"),
        ("ctrl\x00\x08chars\x1f here", "ctrlchars here"),
        ("  runs\t\tof\n\nspace  ", "runs of space"),
        ("<div class='x'>nested <span>tags</span></div> ok", "nested tags ok"),
    ]
    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(cases)], "i long, t string")
    got = {r.i: r.c for r in df.select("i", clean_text(F.col("t")).alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)

    # stages are individually usable: markup-strip alone keeps the raw
    # whitespace, invisible-strip alone keeps markup
    one = spark.createDataFrame([("a<br>b​  c",)], "t string")
    assert one.select(strip_markup(F.col("t")).alias("c")).collect()[0].c == "a b​  c"
    assert one.select(strip_invisible(F.col("t")).alias("c")).collect()[0].c == "a<br>b  c"
    assert one.select(collapse_whitespace(F.col("t")).alias("c")).collect()[0].c == "a<br>b​ c"


def test_clean_text_canonicalizes_dedup_fingerprints(spark):
    """The reason the gate exists: two visually identical documents that
    differ only in zero-width padding / markup / whitespace must
    fingerprint TOGETHER after cleaning (and apart before)."""
    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.functions.text_analysis import (
        clean_text,
        doc_fingerprint,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "the​ quick  brown <i>fox</i>"),
        ],
        "doc_id long, text string",
    )
    raw_fps = df.select(doc_fingerprint(F.col("text")).alias("fp")).collect()
    assert raw_fps[0].fp != raw_fps[1].fp
    clean_fps = df.select(
        doc_fingerprint(clean_text(F.col("text"))).alias("fp")
    ).collect()
    assert clean_fps[0].fp == clean_fps[1].fp


def test_clean_text_sql_twin_matches_spark_exactly(spark):
    """Cross-engine exactness for the cleaning gate (the pii.py
    discipline): Spark's clean_text and DuckDB's sql_clean_text must
    produce byte-identical strings over the documents fixture AND a set
    of adversarial literals — the proof the composed gate can register
    as an oracle-checked query."""
    import duckdb
    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.functions.text_analysis import (
        clean_text,
        sql_clean_text,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "text"
    )
    adversarial = [
        (100001, "<p>Hello <b>world</b></p>"),
        (100002, "a<br>b &amp; c &lt;tag&gt; &#39;q&#39; &#x27;h&#x27;"),
        (100003, "zero​width‍ joined﻿ soft­hyphen"),
        (100004, "ctrl\x01\x02 chars\x1f\x7f here"),
        (100005, "   \t mixed\n\nws   "),
        (100006, "no markup at all"),
        (100007, "<unclosed tag never ends"),
        (100008, ""),
    ]
    both = docs.unionByName(
        spark.createDataFrame(adversarial, "doc_id long, text string")
    )
    got = {
        r.doc_id: r.c
        for r in both.select("doc_id", clean_text(F.col("text")).alias("c")).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    vals = ", ".join(
        f"({i}, '" + t.replace("'", "''") + "')" for i, t in adversarial
    )
    oracle = {
        i: c
        for i, c in con.execute(
            f"SELECT doc_id, {sql_clean_text('text')} FROM ("
            f"SELECT doc_id, text FROM documents "
            f"UNION ALL SELECT * FROM (VALUES {vals}) v(doc_id, text))"
        ).fetchall()
    }
    assert set(got) == set(oracle)
    diffs = [i for i in got if got[i] != oracle[i]]
    assert not diffs, [(i, got[i], oracle[i]) for i in diffs[:3]]


def test_clean_text_idempotent_property(spark):
    """Canonicalization must be a FIXPOINT: clean_text(clean_text(x)) ==
    clean_text(x), else two cleaning passes (a re-crawl, a re-run)
    produce different fingerprints for the same document. Hypothesis
    generates adversarial mixes of tags/entities/controls/whitespace;
    all examples ride one DataFrame per run (spark round-trips are the
    cost, not the row count)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from batch_processing_pipeline_spark.functions.text_analysis import clean_text

    # The round-10 advice found the old pool omitted '&gt;' and 'amp;',
    # so the double-decode bug ('&amp;lt;' -> '<', '&amp;amp;' -> '&')
    # was never exercised. The pool now contains every entity in both
    # tables, the bare fragments ('amp;', 'lt;', '&', ';', '#39;') whose
    # concatenations form entities, raw angle brackets (decoded-output
    # shapes), invisibles INSIDE markup, and numeric refs.
    atom = st.sampled_from(
        ["a", "bb", "<p>", "</p>", "<br>", "&amp;", "&lt;", "&gt;",
         "&nbsp;", "&quot;", "&apos;", "&#39;", "&#x27;", "&#8212;",
         "amp;", "lt;", "gt;", "nbsp;", "&", ";", "#39;", "<", ">",
         " ", "\t", "\n", "​", "‌", "­", "﻿", "\x01", "it's",
         "x<y", "1&2", "<​b>"]
    )
    texts = st.lists(
        st.lists(atom, min_size=0, max_size=12).map("".join),
        min_size=1,
        max_size=16,
    )

    import duckdb
    import pandas as pd

    from batch_processing_pipeline_spark.functions.text_analysis import (
        sql_clean_text,
    )

    con = duckdb.connect()

    @settings(max_examples=6, deadline=None)
    @given(batch=texts)
    def prop(batch):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(batch)], "i long, t string"
        )
        rows = df.select(
            "i",
            clean_text(F.col("t")).alias("once"),
            clean_text(clean_text(F.col("t"))).alias("twice"),
        ).collect()
        for r in rows:
            assert r.once == r.twice, (batch[r.i], r.once, r.twice)
        # the SQL twin must track the fixpoint on the SAME adversarial
        # inputs (the committed twin test covers sf0.01 + fixed
        # literals; this covers whatever Hypothesis invents)
        con.register("df_in", pd.DataFrame({"i": range(len(batch)), "t": batch}))
        oracle = dict(
            con.execute(f"SELECT i, {sql_clean_text('t')} FROM df_in").fetchall()
        )
        for r in rows:
            assert oracle[r.i] == r.once, (batch[r.i], r.once, oracle[r.i])

    prop()
