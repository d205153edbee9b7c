"""Text analysis operators (extension surface).

- **language-ID**: marker-token frequency heuristic, argmax with a
  deterministic tie order.
- **quality scoring**: length / punctuation ratio / stopword ratio —
  the standard cheap pre-filters of LLM-data pipelines (C4-style).
- **token counting**: whitespace tokens + a BPE-ish subword estimate.
- **document fingerprinting**: md5 of normalized content (rolling-
  hash stand-in with a portable hash).

Everything is pure column expressions — these run in whole-stage
codegen over a 100 TB document table with zero Python in the path.
Occurrence counting uses the replace-length trick
(``(len(x) - len(replace(x, m, ''))) / len(m)``) which is portable
to every SQL dialect, including the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rsbsa_etl_spark.functions.dedup import normalized_text
from rsbsa_etl_spark.functions.numeric import dec_round
from rsbsa_etl_spark.streaming import plan_capture
from rsbsa_etl_spark.params import (
    CMS_DEPTH,
    CMS_WIDTH,
    MINHASH_COEFFS,
    MINHASH_MOD,
)

#: marker words per language for the n-gram heuristic. Checked
#: against padded normalized text (" text "), so markers match whole
#: tokens only.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "und", "die", "das"),
    "es": ("el", "de", "y", "los"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def occurrences(haystack: Column, needle: str) -> Column:
    """count non-overlapping occurrences of a literal (portable
    replace-length trick)."""
    return (
        (F.length(haystack) - F.length(F.replace(haystack, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def padded(col: Column) -> Column:
    return F.concat(F.lit(" "), normalized_text(col), F.lit(" "))


def lang_scores(text: Column) -> dict[str, Column]:
    """per-language marker-hit counts."""
    p = padded(text)
    return {
        lang: sum(
            (occurrences(p, f" {m} ") for m in markers), start=F.lit(0).cast("long")
        )
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """argmax language guess with a deterministic tie order: the
    first language in LANG_MARKERS order whose score equals the max
    (and is > 0) wins; 'und' when no marker hits at all."""
    scores = lang_scores(F.col(text_col))
    out = docs.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS],
    )
    mx = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_MARKERS])
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when(
            (F.col(f"score_{lang}") == mx) & (mx > 0), F.lit(lang)
        ).otherwise(expr)
    return out.withColumn("lang_pred", expr)


def quality_score(
    docs: DataFrame, text_col: str = "text", keep: tuple[str, ...] = ()
) -> DataFrame:
    """cheap quality features + a composite score:

    - n_chars / n_tokens / mean token length
    - stopword ratio (fluency proxy)
    - punctuation & digit density
    - composite: bounded sum of feature indicator ranges, rounded —
      deterministic and oracle-matched.

    ``keep`` appends passthrough columns so composed pipelines
    (``curation.curation_pipeline``) stay one projection over one
    scan instead of join-back-by-id.
    """
    t = normalized_text(F.col(text_col))
    p = padded(F.col(text_col))
    n_chars = F.length(t)
    n_tokens = F.size(F.split(t, " "))
    stop_hits = sum(
        (occurrences(p, f" {w} ") for w in STOPWORDS), start=F.lit(0).cast("long")
    )
    n_punct = (
        F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    ).cast("long")
    n_digit = (F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))).cast("long")
    stop_ratio = dec_round(stop_hits / n_tokens, 4)
    punct_ratio = dec_round(n_punct / F.greatest(n_chars, F.lit(1)), 4)
    digit_ratio = dec_round(n_digit / F.greatest(n_chars, F.lit(1)), 4)
    mean_tok_len = dec_round(
        (F.length(F.regexp_replace(t, " ", ""))) / n_tokens, 4
    )
    score = dec_round(
        F.when((n_tokens >= 10) & (n_tokens <= 100000), 0.25).otherwise(0.0)
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 12), 0.25).otherwise(0.0)
        + F.when(stop_ratio >= 0.05, 0.25).otherwise(0.0)
        + F.when(punct_ratio <= 0.2, 0.25).otherwise(0.0),
        2,
    )
    return docs.select(
        "doc_id",
        *keep,
        n_chars.cast("long").alias("n_chars_norm"),
        n_tokens.cast("long").alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        mean_tok_len.alias("mean_tok_len"),
        score.alias("quality"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """whitespace token count + a BPE-ish subword estimate: split on
    transitions (letter/digit/punct boundaries) then ceil(len/4)
    chunks per long token — the standard ~4-chars-per-token
    approximation, computed exactly the same way in the oracle."""
    t = normalized_text(F.col(text_col))
    ws_tokens = F.size(F.split(t, " "))
    # boundary-split: insert breaks between letters and digits, strip
    # punctuation into its own tokens, then count 4-char chunks.
    pieces = F.regexp_replace(t, r"([0-9]+|[^\w\s])", r" $1 ")
    n_pieces = F.size(F.split(F.trim(F.regexp_replace(pieces, r"\s+", " ")), " "))
    subword_est = F.aggregate(
        F.split(F.trim(F.regexp_replace(pieces, r"\s+", " ")), " "),
        F.lit(0).cast("long"),
        lambda acc, tok: acc + F.ceil(F.length(tok) / F.lit(4.0)).cast("long"),
    )
    return docs.select(
        "doc_id",
        ws_tokens.cast("long").alias("ws_tokens"),
        n_pieces.cast("long").alias("pieces"),
        subword_est.alias("bpe_est"),
    )


def tokenizer_fertility(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """per-language tokenizer-efficiency report: fertility
    (subwords per whitespace word) and chars-per-token — the
    standard pretraining diagnostic for how well a tokenizer fits
    each language (high fertility = the language fragments into many
    subwords, so its share of the TOKEN budget exceeds its share of
    the text; the number multilingual data-mix decisions are made
    on). Uses the same boundary-split + ceil(len/4) subword estimate
    as ``token_counts`` so the two keys can never disagree;
    ``tokenizer_fertility_bpe`` is the TRAINED-tokenizer arm of this
    report (same columns, subwords from the learned BPE merges).

    Exactness: per-doc counts are exact longs, the per-language sums
    are exact longs, and each ratio is ONE correctly-rounded double
    division of exact integers + the shared half-up rounding —
    engine-identical. Plan: one scan computing the count expressions
    in the projection, one language-keyed map-side-combining
    aggregate (state = |langs| rows).
    """
    t = normalized_text(F.col(text_col))
    ws_tokens = F.size(F.split(t, " ")).cast("long")
    pieces = F.regexp_replace(t, r"([0-9]+|[^\w\s])", r" $1 ")
    subword_est = F.aggregate(
        F.split(F.trim(F.regexp_replace(pieces, r"\s+", " ")), " "),
        F.lit(0).cast("long"),
        lambda acc, tok: acc + F.ceil(F.length(tok) / F.lit(4.0)).cast("long"),
    )
    per = docs.where(F.col(text_col).isNotNull()).select(
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        ws_tokens.alias("words"),
        subword_est.alias("subwords"),
    )
    return per.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("words").alias("words"),
        F.sum("subwords").alias("subwords"),
        dec_round(F.sum("subwords") / F.sum("words"), 4).alias("fertility"),
        dec_round(F.sum("n_chars") / F.sum("subwords"), 4).alias(
            "chars_per_token"
        ),
    )


def token_gini(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """per-document lexical-diversity signals: type-token ratio and
    unigram Gini impurity (1 − Σ pᵢ²) — the transcendental-free
    stand-in for Shannon entropy in the repeated-token quality
    family (a spam page shouting one token has gini → 0; natural
    prose sits high). Entropy itself needs log(); Gini impurity is a
    RATIONAL function of the counts, so it lands bit-identical in
    any engine — the same discipline as ``rational_idf``.

    Exactness: per-doc token counts c are exact longs; Σc and Σc²
    are exact longs; gini = (n² − Σc²) / n² is ONE correctly-rounded
    double division of exact integers (ttr likewise n_distinct / n),
    then the shared half-up rounding at 6 decimals. Docs with NULL
    text or no tokens after normalization carry no row (the token
    source is the same normalize→split→drop-empties pipeline as
    ``term_topk``).

    Plan: explode → (doc, term) partial-agg → (doc) partial-agg —
    two doc-keyed map-side-combining shuffles, state per doc two
    longs; no global structure, corpus-parallel at any scale.
    """
    toks = (
        docs.where(F.col(text_col).isNotNull())
        .select(
            "doc_id",
            F.explode(
                F.split(normalized_text(F.col(text_col)), " ")
            ).alias("term"),
        )
        .where(F.length("term") > 0)
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    g = tf.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
        F.count("*").cast("long").alias("n_distinct"),
    )
    n2 = F.col("n") * F.col("n")
    return g.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        "n_distinct",
        dec_round(F.col("n_distinct").cast("double") / F.col("n"), 6).alias(
            "ttr"
        ),
        dec_round((n2 - F.col("ss")).cast("double") / n2, 6).alias("gini"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """content fingerprint: md5 over normalized text + a coarse
    locality fingerprint (md5 of the sorted distinct token set —
    order-insensitive, catches shuffled near-dups)."""
    t = normalized_text(F.col(text_col))
    bag = F.array_join(F.array_sort(F.array_distinct(F.split(t, " "))), " ")
    return docs.select(
        "doc_id",
        F.md5(t).alias("content_md5"),
        F.md5(bag).alias("bag_md5"),
    )


def term_topk(docs: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """corpus-level term frequencies, top-k with deterministic
    tiebreak (count desc, term asc).

    explode → count is partial-aggregated before the shuffle (the
    shuffle carries one (term, partial count) pair per term per
    partition — vocabulary-sized, not corpus-sized), and the top-k
    compiles to TakeOrderedAndProject, never a global sort."""
    toks = docs.select(
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("term")
    )
    return (
        toks.where(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("term").asc())
        .limit(k)
    )


def lm_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """bigram language-model fluency score per document.

    The perplexity-style quality signal of LLM-data pipelines: train
    bigram statistics on the corpus itself, then score each document
    by its average transition probability P(w2|w1) = C(w1 w2)/C(w1 ·)
    weighted by occurrence. Documents with <2 tokens have no bigrams
    and are excluded (they carry no transition evidence).

    Determinism: probabilities are quantized to 1e-9 fixed point
    (floor(p·1e9+0.5)) and accumulated as integers, so the score is
    independent of partition order and free of transcendentals (log
    differs at the ulp level across libm implementations; an
    arithmetic mean of transition probabilities ranks documents the
    same way for filtering purposes).

    Scale: per-doc bigram counts collapse the corpus-sized occurrence
    stream before any join; the (w1,w2) and (w1) model tables are
    vocabulary-bounded, so AQE broadcasts them for natural-language
    vocabularies and falls back to shuffle joins beyond that.
    """
    toks = F.split(normalized_text(F.col(text_col)), " ")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    occ = docs.select(
        "doc_id", F.explode(bigrams).alias("bg")
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    # hierarchical rollup (guide §2.3, aggregate before you shuffle):
    # the model tables re-aggregate the per-doc counts instead of
    # re-reading the corpus-sized occurrence stream — C(w1,w2) =
    # Σ_doc n and C(w1·) = Σ_w2 C(w1,w2), exact integer sums. The
    # per-doc table is persisted because it feeds the score join AND
    # the model rollup (one corpus explode total; measured bench-style
    # at sf0.1: 1.02 s → 0.88 s warm, 5.7 s → 3.0 s cold first build;
    # rows bit-equal). Disk-spillable, cleared with the session.
    docbg = (
        occ.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("n")).persist()
    )
    pair = docbg.groupBy("w1", "w2").agg(F.sum("n").alias("c_bg"))
    ctx = pair.groupBy("w1").agg(F.sum("c_bg").alias("c_ctx"))

    q = F.floor(
        F.col("c_bg").cast("double") / F.col("c_ctx") * 1e9 + 0.5
    ).cast("long")
    return (
        docbg.join(pair, ["w1", "w2"])
        .join(ctx, ["w1"])
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_bigrams"),
            dec_round(
                F.sum(F.col("n") * q).cast("double") / 1e9 / F.sum("n"), 6
            ).alias("avg_transition_p"),
        )
    )


def split_assign(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    salt: str = "v1",
) -> DataFrame:
    """deterministic train/test split by keyed hash — the stable
    sampling primitive of training-data pipelines.

    ``rand()``-based splits change membership on every run, partition
    layout, and engine; hashing the document id (salted, so a new
    ``salt`` re-deals the split) makes membership a pure function of
    the key: reproducible across runs, engines, and re-shards, and
    joinable — any table keyed by the same id lands on the same side.
    Pure column expressions, zero shuffle, fully codegen'd.
    """
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return docs.select(
        id_col,
        bucket.cast("int").alias("bucket"),
        F.when(bucket < train_pct, F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def cms_term_estimates(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """count-min sketch frequency estimates for the top-k terms,
    reported against their exact counts.

    The heavy-hitter sketch of streaming/telemetry pipelines: d·w
    integer counters (here 4x1024) replace a vocabulary-sized exact
    count table; estimates only ever overcount (collisions add).
    Like ``kmv_distinct``, the hashes are md5-derived universal
    hashes shared with the DuckDB oracle (same Carter-Wegman coeffs
    as minhash), so the estimate VALUES are cross-engine-checkable,
    not just the sketch's error bound.

    Scale: per-term counts partial-aggregate map-side; counters are
    a depth·width table built from the vocabulary, not the corpus,
    and broadcast back for the estimate join. At 100 TB the exact
    ``tc`` table is the part that grows — a production CMS folds
    counters directly in a partial aggregate over tokens, which this
    construction reduces to once counts exist.
    """
    t = normalized_text(F.col(text_col))
    tc = (
        docs.select(F.explode(F.split(t, " ")).alias("term"))
        .where(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    h = F.md5(F.col("term"))
    ch = tc.select(
        "term",
        "n",
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint").alias("h1"),
        F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint").alias("h2"),
    )
    buckets = [
        ((F.col("h1") * a + F.col("h2") * b + F.lit(c)) % MINHASH_MOD) % width
        for (a, b, c) in MINHASH_COEFFS[:depth]
    ]
    mel = ch.select(
        "term", "n", F.posexplode(F.array(*buckets)).alias("j", "bucket")
    )
    counters = mel.groupBy("j", "bucket").agg(F.sum("n").alias("cnt"))
    top = tc.orderBy(F.col("n").desc(), F.col("term").asc()).limit(k)
    top_mel = mel.join(F.broadcast(top.select("term")), "term")
    return (
        top_mel.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy("term", "n")
        .agg(F.min("cnt").cast("long").alias("n_cms"))
        .select("term", F.col("n").cast("long").alias("n_exact"), "n_cms")
    )


def chunk_tokens_udtf(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """overlapping token-window chunking via a Python UDTF — the
    context-window document chunker of LLM-training pipelines (one
    doc in, ~n_tokens/stride chunk rows out), and the registry's
    UDTF surface (SURVEY §2.9 U2): a genuinely one-to-many row
    generator, where pandas_udf (1:1) and explode-of-an-array (whole
    chunk list materialized per row) are the wrong shape.

    The UDTF class is defined inside this function so it pickles by
    value (ship-by-reference crashes workers whose cwd isn't the
    repo). Chunk boundaries are pure integer arithmetic on the
    whitespace token sequence of NORMALIZED text, so the DuckDB
    list-slicing oracle states the same rows exactly.

    Scale: embarrassingly parallel (per-row generator, no shuffle);
    Arrow-batched in/out. The chunk stream is ~window/stride × corpus
    size — the caller controls blowup with the stride.
    """
    from pyspark.sql.functions import udtf

    from rsbsa_etl_spark.params import CHUNK_STRIDE, CHUNK_WINDOW

    w, s = CHUNK_WINDOW, CHUNK_STRIDE

    @udtf(returnType="chunk_idx int, start_tok int, n_toks int, chunk_text string")
    class ChunkTokens:
        def eval(self, text: str):
            toks = (text or "").split()
            n = len(toks)
            idx = 0
            for start in range(0, n, s):
                piece = toks[start : start + w]
                yield idx, start, len(piece), " ".join(piece)
                idx += 1

    spark = docs.sparkSession
    spark.udtf.register("rsbsa_chunk_tokens", ChunkTokens)
    docs.select("doc_id", normalized_text(F.col(text_col)).alias("norm")).createOrReplaceTempView(
        "_rsbsa_chunk_in"
    )
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.start_tok, c.n_toks, c.chunk_text "
        "FROM _rsbsa_chunk_in d, LATERAL rsbsa_chunk_tokens(d.norm) c"
    )


def rational_idf(n_docs, df):
    """BM25 rational idf ``(N - df + 0.5) / (df + 0.5)`` — the same
    monotone ordering as the classic ``log(N/df)`` but free of
    transcendentals, so scores are pure rational functions of integer
    counts and bit-exact across engines. Single-sourced for
    tfidf_topk / bm25_topk / retrieval.hybrid_search_rrf (and their
    oracle mirrors), so the smoothing convention cannot drift
    between operators."""
    return (n_docs - df + 0.5) / (df + 0.5)


def tfidf_topk(docs: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """per-document top-k characteristic terms by TF-IDF.

    The keyword-extraction primitive of document pipelines. The idf is
    the BM25 rational form ``(N - df + 0.5) / (df + 0.5)`` — same
    monotone ordering as the classic ``log(N/df)`` but free of
    transcendentals, so the score is a pure rational function of
    integer counts and bit-exact across engines (log differs at the
    ulp level between libm implementations; see lm_score).

    Scale: tf partial-aggregates map-side before its (doc_id, term)
    shuffle; df is derived from tf (already one row per doc-term), is
    vocabulary-bounded, and broadcasts back; N is a scalar. The only
    corpus-sized shuffle is the per-doc rank window, partitioned by
    doc_id — no skew (per-doc vocabulary is document-sized).
    """
    t = normalized_text(F.col(text_col))
    tf = (
        docs.select("doc_id", F.explode(F.split(t, " ")).alias("term"))
        .where(F.length("term") > 0)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            dec_round(
                F.col("tf")
                * rational_idf(F.col("n_docs"), F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .drop("rnk")
    )


def stratified_sample(
    events: DataFrame,
    strata_col: str = "event_type",
    id_col: str = "event_id",
    rates: dict[str, int] | None = None,
    default_pct: int = 10,
    salt: str = "v1",
) -> DataFrame:
    """deterministic per-stratum downsampling — class rebalancing by
    keyed hash, the stratified companion of ``split_assign``.

    Each stratum gets its own keep-rate (percent); membership is a
    pure function of (salt, id), so the sample is reproducible across
    runs/engines/shards and consistent for the same id across tables.
    ``df.sampleBy`` has the same shape but draws from a seeded RNG
    whose stream depends on partitioning — useless as a contract.
    Pure column expressions: no shuffle, fully codegen'd.
    """
    rates = rates or {"error": 100, "click": 50}
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    pct = F.lit(default_pct)
    for stratum, rate in sorted(rates.items()):
        pct = F.when(F.col(strata_col) == stratum, F.lit(rate)).otherwise(pct)
    return events.where(bucket < pct).select(
        id_col, strata_col, bucket.cast("int").alias("bucket")
    )


def ngram_topk(docs: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """corpus-level word-bigram frequencies, top-k with deterministic
    tiebreak (count desc, gram asc) — the n-gram generalization of
    ``term_topk`` used for boilerplate detection and corpus
    fingerprinting in LLM-data pipelines.

    Bigrams are built array-side (zip_with of two slices — no
    self-join, no UDF) and exploded straight into a partial-aggregated
    count, so the shuffle carries (gram, partial-count) pairs bounded
    by bigram vocabulary, and the top-k compiles to
    TakeOrderedAndProject rather than a global sort.
    """
    toks = F.split(normalized_text(F.col(text_col)), " ")
    n = F.size(toks)
    grams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        docs.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("gram").asc())
        .limit(k)
    )


def vocab_coverage(docs: DataFrame, text_col: str = "text", vocab_k: int = 256) -> DataFrame:
    """per-document out-of-vocabulary rate against the corpus's own
    top-k term vocabulary — the tokenizer-fit signal of an LLM-data
    pipeline (high OOV ⇒ the doc is noise, code, or another
    language relative to the corpus).

    The exploded term stream is aggregated once per (doc, term); the
    vocabulary (count desc, term asc — deterministic at the rank
    boundary) is vocabulary-bounded and broadcasts into the coverage
    join. Shuffles carry (doc, term) partials, never raw text; the
    vocab build and the coverage join share one exploded pass.
    """
    toks = docs.select(
        "doc_id",
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("term"),
    ).where(F.length("term") > 0)
    doc_terms = toks.groupBy("doc_id", "term").agg(F.count("*").alias("n"))
    vocab = (
        doc_terms.groupBy("term")
        .agg(F.sum("n").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("term").asc())
        .limit(vocab_k)
        .select("term")
    )
    flagged = doc_terms.join(
        F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "term", "left"
    )
    return flagged.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_oov"),
        dec_round(
            F.sum(
                F.when(F.col("in_vocab").isNull(), F.col("n")).otherwise(F.lit(0))
            ).cast("double")
            / F.sum("n"),
            6,
        ).alias("oov_rate"),
    )


def inverted_index(docs: DataFrame, text_col: str = "text", cap: int = 16) -> DataFrame:
    """posting-list construction: term → sorted doc-id list (capped)
    with document frequency — the IR index build step, and the base
    table for any retrieval-augmented pipeline.

    Postings aggregate from distinct (term, doc) pairs (partial
    map-side), sorted for determinism, capped so hot terms ("the")
    don't materialize corpus-sized arrays — df_total still reports
    the true frequency. The shuffle carries (term, doc_id) pairs
    after per-doc dedup, never positions or raw text.
    """
    pairs = (
        docs.select(
            "doc_id",
            F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("term"),
        )
        .where(F.length("term") > 0)
        .distinct()
    )
    return pairs.groupBy("term").agg(
        F.count("*").alias("df_total"),
        F.slice(F.array_sort(F.collect_list("doc_id")), 1, cap).alias("postings"),
    ).select(
        "term",
        "df_total",
        F.concat_ws(",", F.transform("postings", lambda d: d.cast("string"))).alias(
            "postings_csv"
        ),
    )


def term_pmi(
    docs: DataFrame,
    text_col: str = "text",
    vocab_k: int = 64,
    min_pair_docs: int = 5,
    k: int = 50,
) -> DataFrame:
    """term co-occurrence strength (PMI-style lift): for pairs of
    top-``vocab_k`` terms, how much more often they share a document
    than independence predicts — collocation mining without the
    non-portable log (lift is a monotone transform of PMI, so the
    ranking is identical).

    The vocabulary cap bounds the pair space to vocab_k² before
    anything quadratic happens: per-doc distinct terms are first
    semi-joined against the broadcast vocab, so pair generation is
    |vocab∩doc|² per doc, not |doc|². Counts are exact integers; the
    lift is one double division, fixed-point rounded.
    """
    terms = (
        docs.select(
            "doc_id",
            F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("term"),
        )
        .where(F.length("term") > 0)
        .distinct()
    )
    vocab = (
        terms.groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(vocab_k)
    )
    # persisted: the quadratic pair stage reads tv through TWO
    # aliases and exchange reuse does not bridge them — without the
    # cache the corpus explode+distinct+vocab-semi-join subtree runs
    # once per alias (measured bench-style at sf0.1: 1.58 s → 1.03 s
    # with the cache, cold first-build 6.7 s → 3.4 s). Bounded:
    # ≤ docs × vocab_k rows, disk-spillable, dropped with the
    # session/bench clearCache like every other intra-query persist.
    tv = terms.join(F.broadcast(vocab), "term").persist()
    a, b = tv.alias("a"), tv.alias("b")
    pair_docs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .groupBy(F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b"))
        .agg(F.count("*").alias("n_pair"))
        .where(F.col("n_pair") >= min_pair_docs)
    )
    n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))
    da = vocab.select(F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    db = vocab.select(F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    lift = (
        F.col("n_pair").cast("double")
        * F.col("n_docs").cast("double")
        / F.col("df_a").cast("double")
        / F.col("df_b").cast("double")
    )
    return (
        pair_docs.join(F.broadcast(da), "term_a")
        .join(F.broadcast(db), "term_b")
        .join(F.broadcast(n_docs))
        .select(
            "term_a",
            "term_b",
            "n_pair",
            dec_round(lift, 6).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), F.col("term_a").asc(), F.col("term_b").asc())
        .limit(k)
    )


def bm25_topk(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """per-document top-k terms by BM25 — TF-IDF with the two
    refinements retrieval stacks actually ship: tf saturation
    (``tf·(k1+1)/(tf + k1·norm)``) and length normalization
    (``norm = 1-b + b·dl/avgdl``).

    Cross-engine float discipline (same rule as ``tfidf_topk``): the
    idf keeps the rational BM25 form ``(N-df+0.5)/(df+0.5)`` with no
    transcendentals, and the saturation term is rational in integer
    counts, so every factor is a correctly-rounded IEEE op mirrored
    token-for-token in the DuckDB oracle.

    Scale shape: tf partial-aggregates map-side before the
    (doc_id, term) shuffle; dl (doc length) folds from tf — already
    one row per doc-term — reusing the doc_id partitioning; df and
    the avgdl scalar are vocabulary-bounded / single-row and
    broadcast. The only corpus-sized shuffle is the per-doc rank
    window, same as ``tfidf_topk``.
    """
    t = normalized_text(F.col(text_col))
    tf = (
        docs.select("doc_id", F.explode(F.split(t, " ")).alias("term"))
        .where(F.length("term") > 0)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.select(F.count("*").alias("n_docs"))
    avg = dl.agg(
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl")
    )
    idf = rational_idf(F.col("n_docs"), F.col("df"))
    sat = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "term")
        .join(F.broadcast(n))
        .join(F.broadcast(avg))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("dl").cast("long").alias("dl"),
            dec_round(idf * sat, 6).alias("bm25"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("bm25").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "dl", "bm25")
    )


def bpe_pair_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """one counting round of BPE tokenizer training: the corpus-wide
    frequency of every ADJACENT CHARACTER PAIR inside tokens, top-K
    by count. Real BPE iterates merge→recount; the count step is the
    expensive, corpus-sized part and this is its exact Spark shape —
    the merge loop around it is driver logic over a vocabulary-sized
    table.

    Scale: pairs explode ~L-per-token rows but the aggregate is
    map-side partial over a tiny key space (charset² ≤ a few
    thousand), so the shuffle carries partial counts, not
    occurrences. Top-K with a total tie order (count desc, pair asc)
    compiles to TakeOrderedAndProject.
    """
    from rsbsa_etl_spark import params as P
    from rsbsa_etl_spark.functions.dedup import tokens_col

    toks = docs.select(F.explode(tokens_col(F.col(text_col))).alias("tok"))
    pairs = toks.where(F.length("tok") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(P.BPE_TOPK)
    )


def lang_confusion(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """classifier-eval pattern: confusion matrix of the n-gram
    language identifier against the fixture's stored ``lang`` label
    — counts per (lang_true, lang_pred). The eval join is doc-level
    and the output is |langs|² rows; the corpus-sized work is the
    lang_id scoring scan itself."""
    pred = lang_id(docs, text_col).select("doc_id", "lang_pred")
    return (
        docs.select("doc_id", F.col("lang").alias("lang_true"))
        .join(pred, "doc_id")
        .groupBy("lang_true", "lang_pred")
        .agg(F.count("*").alias("n"))
    )


def corpus_summary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """the dataset card, as a query: one row of corpus-level facts —
    document/token volume, language and source coverage, and the
    exact-duplicate rate — the summary a curated training set ships
    with (and the numbers a pipeline operator checks after every
    rebuild).

    One projection computes per-doc facts (token count, content
    fingerprint) in the scan; ONE global aggregate produces the
    card. The distinct counts ride Spark's expand-based multi-
    distinct aggregation — partial-aggregated, no extra scan. Ratios
    are fixed-point rounded; everything else is integer.
    """
    from rsbsa_etl_spark.functions.dedup import normalized_text
    from rsbsa_etl_spark.functions.numeric import dec_round

    base = docs.select(
        "doc_id",
        "lang",
        "source",
        F.size(F.split(normalized_text(F.col(text_col)), " ")).cast("long").alias(
            "n_tokens"
        ),
        F.md5(normalized_text(F.col(text_col))).alias("fp"),
    )
    return base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("fp").cast("long").alias("n_unique"),
    ).select(
        "n_docs",
        "total_tokens",
        "n_langs",
        "n_sources",
        "n_unique",
        # empty corpus: the card still emits its one row, with NULL
        # ratios — not an ANSI DIVIDE_BY_ZERO crash
        F.when(
            F.col("n_docs") > 0,
            dec_round(F.col("total_tokens") / F.col("n_docs"), 4),
        ).alias("avg_doc_tokens"),
        F.when(
            F.col("n_docs") > 0,
            dec_round((F.col("n_docs") - F.col("n_unique")) / F.col("n_docs"), 6),
        ).alias("dup_rate"),
    )


def tokenize_offsets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """token → character-offset map over the normalized text: one
    row per token with its position, start offset and length — the
    span-alignment primitive (projecting annotations, quality spans
    or redaction masks from character space into token space needs
    exactly this table).

    ``posexplode`` keeps the token index; the start offset is a
    running sum of (token length + 1 separator) per document — a
    window bounded by one document's token count, never corpus-
    shaped. All integer arithmetic.
    """
    from pyspark.sql import Window

    from rsbsa_etl_spark.functions.dedup import normalized_text

    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(normalized_text(F.col(text_col)), " ")).alias(
            "pos", "token"
        ),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return toks.select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        "token",
        F.coalesce(F.sum(F.length("token") + 1).over(w), F.lit(0))
        .cast("long")
        .alias("start"),
        F.length("token").cast("long").alias("len"),
    )


def feature_hash_vectors(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """hashing-trick bag-of-words: each document becomes a dense
    FEATURE_HASH_DIM-long count vector, token → slot by hash —
    the fixed-width featurization (Weinberger et al.'s feature
    hashing) that needs NO vocabulary build, no global dictionary
    shuffle, and no vocabulary-sized model state: the properties
    that make it the featurizer that still works at 100 TB.

    Two bounded shuffles: (doc, slot) partial counts (≤ dim rows per
    doc survive the map-side combine), then per-doc map assembly;
    the dense vector is a pure array expression over the slot map.
    Hash is the shared md5 hex-prefix integer, so slots — and every
    collision — are engine-identical.
    """
    from rsbsa_etl_spark.functions.dedup import tokens_col
    from rsbsa_etl_spark.params import FEATURE_HASH_DIM as D

    tok = docs.select(
        "doc_id", F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    slot = F.pmod(
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint"),
        F.lit(D),
    ).cast("int")
    sparse = (
        tok.select("doc_id", slot.alias("slot"))
        .groupBy("doc_id", "slot")
        .agg(F.count("*").cast("long").alias("n"))
    )
    m = sparse.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("slot", "n"))).alias("mp"),
        F.sum("n").alias("n_tokens"),
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(D - 1)),
        lambda s: F.coalesce(
            F.element_at(F.col("mp"), s.cast("int")), F.lit(0).cast("long")
        ),
    )
    return m.select("doc_id", "n_tokens", vec.alias("vec"))


def _bpe_vocab_frame(docs, text_col, keep_tok):
    """vocabulary collapse shared by BPE train/inference: one row per
    distinct word with its corpus count and the ``||``-delimited
    initial (character) symbol string."""
    from rsbsa_etl_spark.functions.dedup import tokens_col

    words = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("tok"))
        .where(F.length("tok") >= 1)
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    chars = F.expr(
        "transform(sequence(1, length(tok)), i -> substring(tok, i, 1))"
    )
    cols = (["tok"] if keep_tok else []) + ["cnt"]
    return words.select(
        *cols,
        F.concat(
            F.lit("||"), F.array_join(chars, "||"), F.lit("||")
        ).alias("seq"),
    ).persist()


def _bpe_syms(col="seq"):
    return F.filter(F.split(F.col(col), r"\|\|"), lambda x: x != "")


def _bpe_merge_rounds(w: DataFrame, rounds: int):
    """the BPE training loop, single-sourced for bpe_train AND
    bpe_segment (a tie-break or delimiter fix applied here reaches
    both): per round, a vocabulary-sized weighted pair count, a
    1-row driver argmax under the TOTAL (count desc, pair asc)
    order, and a literal-replace merge. Returns the merged frame and
    the learned rules [(round, left, right, merged, count)]. Stops
    early when no pairs remain (fully merged vocabulary)."""
    carry = [c for c in w.columns if c != "seq"]
    merges: list[tuple] = []
    for r in range(1, rounds + 1):
        pairs = (
            w.select("cnt", _bpe_syms().alias("s"))
            .where(F.size("s") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1),"
                        " i -> struct(s[i-1] AS l, s[i] AS r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").cast("long").alias("n"))
        )
        best_df = pairs.orderBy(F.desc("n"), F.asc("l"), F.asc("r")).limit(1)
        # audit evidence: each round's argmax plan (gate-closed no-op
        # outside `python -m rsbsa_etl_spark audit` — see plan_capture)
        plan_capture.record(best_df, f"bpe_round_{r}")
        best = best_df.collect()
        if not best:
            break
        l, rt, n = best[0].l, best[0].r, best[0].n
        merges.append((r, l, rt, l + rt, n))
        w = w.select(
            *carry,
            F.replace(
                F.col("seq"),
                F.lit(f"|{l}||{rt}|"),
                F.lit(f"|{l}{rt}|"),
            ).alias("seq"),
        )
    return w, merges


def bpe_train(
    docs: DataFrame, text_col: str = "text", rounds: int | None = None
) -> DataFrame:
    """BPE tokenizer TRAINING as a distributed job: ``rounds``
    iterations of count-adjacent-pairs → merge-the-winner — the loop
    that produces a tokenizer's ``merges.txt`` (Sennrich et al. 2016),
    of which ``bpe_pair_counts`` is the single counting step.

    Output: one row per learned merge rule
    (round, left, right, merged, pair_count) — the training
    artifact itself, exactly as a tokenizer ships it.

    Distributed shape per round (``_bpe_merge_rounds``):
    - the corpus collapses ONCE up front to the vocabulary (word,
      count) table — all later work is vocabulary-sized, the
      standard BPE-training trick (word-internal pairs don't cross
      word boundaries, so identical words share their pair counts);
    - pair counting is an explode + map-side-partial groupBy over a
      symbol-pair key space, weighted by word count;
    - the argmax row (count desc, then lexicographic pair — a TOTAL
      order, so ties are deterministic) is a 1-row driver round-trip
      per round, the same bounded-metadata pattern as the IVF
      centroid loop;
    - the merge applies to every word via literal ``replace`` on a
      ``||``-delimited symbol string ("||l||o||w||"): string replace
      is left-to-right non-overlapping in BOTH engines, which is
      exactly BPE's merge order within a word, and a literal (not
      regex) match needs no symbol escaping. (A corpus whose tokens
      themselves contain ``|`` would need a rarer delimiter; both
      engines would mis-parse identically, so parity still holds.)

    The driver loop holds only R merge rules; corpus-sized state
    never leaves the cluster.

    Persist contract: the vocabulary symbol table stays cached after
    this returns (each round's count job reuses it). Callers looping
    many queries should ``spark.catalog.clearCache()`` between runs,
    as bench.py does.
    """
    from rsbsa_etl_spark import params as P

    spark = docs.sparkSession
    rr = P.BPE_TRAIN_ROUNDS if rounds is None else rounds
    w = _bpe_vocab_frame(docs, text_col, keep_tok=False)
    _, merges = _bpe_merge_rounds(w, rr)
    return spark.createDataFrame(
        merges,
        "round int, left string, right string, merged string, "
        "pair_count bigint",
    )


def bpe_segment(
    docs: DataFrame, text_col: str = "text", rounds: int | None = None
) -> DataFrame:
    """BPE INFERENCE over the corpus: train ``rounds`` merges
    (``_bpe_merge_rounds`` — the SAME loop as ``bpe_train``), apply
    them to every word, and report per-document subword statistics —
    (doc_id, n_tokens, n_symbols, chars_per_symbol). The
    chars-per-symbol ratio is the compression a tokenizer achieves,
    the number a data pipeline tracks to price a corpus in tokens.

    Scale shape: segmentation happens ONCE PER DISTINCT WORD on the
    vocabulary table (the same collapse bpe_train uses — identical
    words segment identically), then a plain equi-join maps each
    document's tokens to their symbol counts; per-doc stats are one
    partial-agg groupBy. The merge rules themselves are R driver
    rows; corpus-sized state never leaves the cluster.

    Persist contract: as ``bpe_train`` — the vocabulary symbol table
    stays cached; loop-running callers clearCache between runs.
    """
    from rsbsa_etl_spark import params as P
    from rsbsa_etl_spark.functions.dedup import tokens_col
    from rsbsa_etl_spark.functions.numeric import dec_round

    rr = P.BPE_TRAIN_ROUNDS if rounds is None else rounds
    w = _bpe_vocab_frame(docs, text_col, keep_tok=True)
    w, _ = _bpe_merge_rounds(w, rr)
    vocab = w.select(
        "tok",
        F.size(_bpe_syms()).cast("long").alias("n_syms"),
        F.length("tok").cast("long").alias("n_chars"),
    )
    tok_rows = docs.select(
        "doc_id", F.explode(tokens_col(F.col(text_col))).alias("tok")
    ).where(F.length("tok") >= 1)
    per_doc = (
        tok_rows.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("n_syms").cast("long").alias("n_symbols"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_symbols",
        dec_round(
            F.col("sum_chars") / F.col("n_symbols"), 4
        ).alias("chars_per_symbol"),
    )


def tokenizer_fertility_bpe(
    docs: DataFrame, text_col: str = "text", rounds: int | None = None
) -> DataFrame:
    """per-language fertility under the TRAINED BPE tokenizer — the
    trained counterpart of ``tokenizer_fertility``'s ceil(len/4)
    heuristic arm: train ``rounds`` merges (``_bpe_merge_rounds``,
    the same loop as ``bpe_train``/``bpe_segment``), segment every
    distinct word once on the vocabulary table, then aggregate
    subword counts PER LANGUAGE instead of per document. Fertility =
    trained subwords per word; chars-per-token = corpus chars per
    trained subword — the actual token-budget numbers a multilingual
    mix is priced on once a real tokenizer exists, not an estimate.

    Exactness: per-word symbol counts are exact longs from the
    merged symbol string; per-language sums are exact longs; each
    ratio is ONE correctly-rounded double division of exact integers
    + the shared half-up rounding — engine-identical (the
    ``tokenizer_fertility`` discipline).

    Scale shape: identical to ``bpe_segment`` — segmentation cost is
    vocabulary-sized, the corpus-sized work is one explode + one
    vocab equi-join + one lang-keyed partial agg (state = |langs|
    rows plus the distinct-doc count's doc_id set, bounded by the
    corpus's doc count per language partition).
    """
    from rsbsa_etl_spark import params as P
    from rsbsa_etl_spark.functions.dedup import tokens_col
    from rsbsa_etl_spark.functions.numeric import dec_round

    rr = P.BPE_TRAIN_ROUNDS if rounds is None else rounds
    w = _bpe_vocab_frame(docs, text_col, keep_tok=True)
    w, _ = _bpe_merge_rounds(w, rr)
    vocab = w.select(
        "tok",
        F.size(_bpe_syms()).cast("long").alias("n_syms"),
        F.length("tok").cast("long").alias("n_chars"),
    )
    tok_rows = docs.select(
        "doc_id",
        "lang",
        F.explode(tokens_col(F.col(text_col))).alias("tok"),
    ).where(F.length("tok") >= 1)
    per_lang = (
        tok_rows.join(vocab, "tok")
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("words"),
            F.sum("n_syms").cast("long").alias("subwords"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )
    return per_lang.select(
        "lang",
        "n_docs",
        "words",
        "subwords",
        dec_round(F.col("subwords") / F.col("words"), 4).alias("fertility"),
        dec_round(F.col("sum_chars") / F.col("subwords"), 4).alias(
            "chars_per_token"
        ),
    )


def hashed_slot_counts(
    docs: DataFrame, text_col: str, dim: int
) -> DataFrame:
    """shared hashed bag-of-words kernel of the TRAINED selection/
    classification operators (``curation.dsir_weights``,
    ``rocchio_classify``): token → md5-hex-prefix slot in
    ``[0, dim)``, collapsed to per-(doc_id, lang, slot) counts — the
    one corpus-sized shuffle either operator performs. Single-sourced
    (with its oracle twin ``oracles._hashed_slot_cte``) so the hash
    scheme — and every collision — cannot drift between the two
    operators and their SQL mirrors. (``feature_hash_vectors`` keeps
    its own copy by pinned contract: it counts blank documents' empty
    token; these operators drop zero-evidence tokens.)"""
    from rsbsa_etl_spark.functions.dedup import tokens_col

    tok = docs.select(
        "doc_id",
        F.col("lang"),
        F.explode(tokens_col(F.col(text_col))).alias("tok"),
    ).where(F.length("tok") > 0)
    slot = F.pmod(
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint"),
        F.lit(int(dim)),
    ).cast("int")
    return (
        tok.select("doc_id", "lang", slot.alias("slot"))
        .groupBy("doc_id", "lang", "slot")
        .agg(F.count("*").cast("long").alias("n"))
    )


def rocchio_classify(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """nearest-centroid (Rocchio) text classifier over hashed
    bag-of-words, trained and evaluated in one plan — the trained
    counterpart of the rule-based ``lang_id``: class profiles are
    LEARNED from the corpus's own ``lang`` labels, the way
    production pipelines train fastText-style quality/language
    classifiers on a labeled slice and score the whole crawl.

    Train: each class's centroid is its Laplace-smoothed token
    distribution over ``ROCCHIO_HASH_DIM`` hashed buckets (the
    shared md5 slot scheme — no vocabulary build, the property that
    keeps the model constant-size at 100 TB). Predict: argmax over
    classes of the document-count · centroid dot product (ties →
    first class name). Centroid probabilities are quantized to 1e-9
    fixed point so the per-class scores are exact integer sums —
    partition-order-independent and engine-identical (the lm_score
    discipline). Documents with zero tokens carry no evidence and
    drop out.

    Scale: the model is a ``|classes| × dim`` grid (a few hundred
    rows) re-aggregated FROM the per-doc sparse counts — not fresh
    corpus scans per statistic — and broadcast back onto them, so
    the corpus is read twice (model subtree + scoring join);
    corpus-sized shuffles are the (doc, slot) collapse and the
    |classes|-fanout argmax window, both keyed by doc_id (no skew:
    per-doc work is bounded by dim × classes). A loop-running
    caller can persist the (doc, slot) counts to make it one
    physical scan.
    """
    from rsbsa_etl_spark.params import ROCCHIO_HASH_DIM

    d = int(ROCCHIO_HASH_DIM)
    # labeled-documents contract: a NULL label can neither train a
    # centroid nor be scored against one (and Spark/DuckDB order a
    # NULL class differently in the argmax tie-break)
    doc_counts = hashed_slot_counts(docs, text_col, d).where(
        F.col("lang").isNotNull()
    )

    # full class × slot grid so unseen (class, slot) cells still get
    # their smoothed probability — assembled in ONE pass from the
    # per-class slot map (|classes| rows of dim-entry maps; a
    # grid-build + join-back would re-run the corpus scan its
    # lineage reaches), then re-exploded to |classes|·dim rows
    cnt = doc_counts.groupBy(F.col("lang").alias("cls"), "slot").agg(
        F.sum("n").cast("long").alias("c")
    )
    dense = cnt.groupBy("cls").agg(
        F.map_from_entries(F.collect_list(F.struct("slot", "c"))).alias(
            "mp"
        ),
        F.sum("c").cast("long").alias("n_cls"),
    )
    model = dense.select(
        "cls",
        "n_cls",
        "mp",
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("slot"),
    ).select(
        "cls",
        "slot",
        F.floor(
            (
                F.coalesce(
                    F.element_at(F.col("mp"), F.col("slot").cast("int")),
                    F.lit(0).cast("long"),
                )
                + F.lit(0.5)
            )
            / (F.col("n_cls") + F.lit(d / 2.0))
            * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("q_p"),
    )

    from pyspark.sql import Window

    scored = (
        doc_counts.join(F.broadcast(model), "slot")
        .groupBy("doc_id", "lang", "cls")
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.sum(F.col("n") * F.col("q_p")).cast("long").alias("s"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("s").desc(), F.col("cls").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select(
            "doc_id",
            F.col("lang").alias("lang_true"),
            F.col("cls").alias("lang_pred"),
            "n_tokens",
            dec_round(
                F.col("s").cast("double") / F.lit(1e9) / F.col("n_tokens"), 6
            ).alias("score"),
        )
    )
