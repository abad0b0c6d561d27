"""Text-analysis operators for training-data pipelines.

Language ID (stopword-hit heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting.  Every
operator is a pure Catalyst expression pipeline over the ``documents``
table schema — no Python, fully codegen'd, safe at 100 TB.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..utils.misc import cut_lineage, free_local_checkpoint

# Minimal per-language stopword seeds for the n-gram/stopword heuristic.
LANG_STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "que", "de", "en", "una", "es", "por", "con"],
}

_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_col(text_col: str) -> F.Column:
    """Whitespace tokens (lowercased)."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )


def token_count(df: DataFrame, text_col: str = "text", out_col: str = "n_tokens") -> DataFrame:
    """Whitespace token count plus a BPE-ish regex token count
    (letter runs / digit runs / single punctuation)."""
    return df.withColumn(out_col, F.size(tokens_col(text_col))).withColumn(
        f"{out_col}_bpe",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(_TOKEN_REGEX), 0)),
    )


def language_id(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred"
) -> DataFrame:
    """Heuristic language ID: language with the most stopword hits.

    ``array_intersect`` against tiny literal stopword arrays, then a
    ``greatest``-based argmax — one projection, no shuffle.
    """
    toks = tokens_col(text_col)
    hit_cols = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in LANG_STOPWORDS.items()
    }
    langs = list(hit_cols)
    best = F.greatest(*[hit_cols[l] for l in langs])
    pred = F.lit("unknown")
    # reverse order so earlier languages win ties deterministically
    for lang in reversed(langs):
        pred = F.when(
            (hit_cols[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return df.withColumn(out_col, pred)


def quality_score(
    df: DataFrame, text_col: str = "text", out_col: str = "quality"
) -> DataFrame:
    """Heuristic quality in [0, 1] from length, punctuation density,
    stopword ratio and mean word length; components exposed as columns."""
    text = F.col(text_col)
    n_chars = F.length(text)
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    n_punct = F.size(
        F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0)
    )
    en_stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    stop_ratio = F.size(F.array_intersect(toks, en_stop)) / F.greatest(
        F.least(n_tokens, F.lit(len(LANG_STOPWORDS["en"]))), F.lit(1)
    )
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    mean_word_len = n_chars / F.greatest(n_tokens, F.lit(1))
    length_score = F.least(n_chars / F.lit(1000.0), F.lit(1.0))
    word_len_score = F.when(
        (mean_word_len >= 3) & (mean_word_len <= 12), F.lit(1.0)
    ).otherwise(F.lit(0.3))
    punct_score = F.when(punct_ratio < 0.2, F.lit(1.0)).otherwise(
        F.greatest(F.lit(1.0) - (punct_ratio - 0.2) * 2, F.lit(0.0))
    )
    score = (
        length_score * 0.3
        + word_len_score * 0.2
        + punct_score * 0.2
        + F.least(stop_ratio, F.lit(1.0)) * 0.3
    )
    return (
        df.withColumn("punct_ratio", punct_ratio.cast("double"))
        .withColumn("stopword_ratio", F.least(stop_ratio, F.lit(1.0)).cast("double"))
        .withColumn("mean_word_len", mean_word_len.cast("double"))
        .withColumn(out_col, score.cast("double"))
    )


def document_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "fingerprint",
    shingle_size: int = 8,
) -> DataFrame:
    """Content fingerprint: xxhash64 of the text plus a winnowed
    min-shingle-hash robust to small edits (the rolling-hash analogue
    expressed with sequence/transform/min)."""
    from .dedup import _shingle_expr

    min_shingle = F.array_min(
        F.transform(
            _shingle_expr(text_col, shingle_size), lambda s: F.xxhash64(s)
        )
    )
    return df.withColumn(
        out_col, F.xxhash64(F.col(text_col))
    ).withColumn(f"{out_col}_robust", min_shingle)


# RE2-compatible patterns (no backreferences/lookaround): identical
# semantics in Spark's Java regex and DuckDB's RE2, which is what lets
# the redaction oracle compare transformed text byte-for-byte.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+?[0-9]{1,3}[ .\-]?\(?[0-9]{3}\)?[ .\-][0-9]{3}[ .\-][0-9]{4}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted",
    kinds: tuple = ("email", "ipv4", "phone"),
) -> DataFrame:
    """Replace email/IPv4/phone-shaped substrings with ``[KIND]``
    tokens and count replacements per kind — the scrubbing pass of a
    training-data pipeline.  Pure Catalyst ``regexp_replace`` chains
    (whole-stage codegen, no shuffle, no Python); counts are derived
    from length deltas of a single-kind redaction, so one scan
    computes text and counts together.
    """
    out = df
    redacted = F.col(text_col)
    for kind in kinds:
        pat = PII_PATTERNS[kind]
        token = f"[{kind.upper()}]"
        # matches collapse to a fixed token; count = how many times a
        # lone-kind replace shrinks the remaining text, recovered as
        # the occurrence count via split-size (RE2-safe, no lookaround)
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.split(redacted, pat)) - 1,
        )
        redacted = F.regexp_replace(redacted, pat, token)
    return out.withColumn(out_col, redacted)


# Gopher-style repetition thresholds (Rae et al. 2021, table A1 spirit):
# a document is kept when none of its repetition signals exceed these.
REPETITION_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_bigram_char_frac": 0.20,
    "dup_trigram_char_frac": 0.30,
    "symbol_word_ratio": 0.10,
}

_SYMBOL_REGEX = r"\.{3}|…|#"


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher/C4-style repetition quality signals, one row per document.

    Signals (all exact, deterministic):

    * ``n_lines`` / ``dup_line_frac`` — fraction of '\\n'-split lines
      that are repeats of an earlier line: ``(n - n_distinct) / n``;
    * ``dup_line_char_frac`` — characters inside lines occurring more
      than once over total line characters;
    * ``top_bigram_char_frac`` — characters covered by the MOST
      FREQUENT word bigram (Gopher's rule: argmax by count, ties
      toward larger coverage — NOT the max of count x length over all
      bigrams, which a long rare bigram could win) over all bigram
      characters;
    * ``dup_trigram_char_frac`` — characters inside word trigrams
      occurring more than once over all trigram characters;
    * ``symbol_word_ratio`` — '#' / ellipsis occurrences per word;
    * ``keep`` — True iff every signal is within
      :data:`REPETITION_THRESHOLDS`.

    Scale shape: ONE explode of a tagged (kind, item) array, then two
    map-side-combinable aggregations keyed by ``(id, kind, item)`` and
    ``(id,)`` — no per-document quadratic work, no Python.  Every key
    is document-prefixed, so a hot shuffle key cannot arise and a
    single huge document is collapsed map-side to its distinct items
    before it crosses the wire.
    """
    # materialize tokens/lines as projection attributes so the gram
    # lambdas reference a per-row value, not a re-evaluated expression
    # (Catalyst does not hoist subexpressions out of HOF lambdas; the
    # naive form re-splits the document per gram index)
    # NULL text coalesces to '' so the document still yields its row
    # (one empty line, zero grams, keep decided by the thresholds) —
    # exploding a NULL item array would silently drop the id from the
    # output, unlike every other quality gate in this module
    txt = F.coalesce(F.col(text_col), F.lit(""))
    pre = df.select(
        F.col(id_col),
        txt.alias(text_col),
        F.filter(
            F.split(F.lower(txt), r"\s+"), lambda t: t != F.lit("")
        ).alias("__toks"),
        F.split(txt, r"\n").alias("__lines"),
    )
    # symbol_word_ratio is a pure function of the document, so compute
    # it ONCE here and let it RIDE the aggregations as a functionally-
    # dependent extra group key (constant within each doc's groups)
    # instead of re-scanning the corpus for a second symbols relation
    # and joining it back on the id: the join cost two Exchanges (or a
    # doc-sized broadcast) plus a FULL second parquet scan +
    # re-tokenize of every document, versus 8 bytes per exploded item
    # row here (r19, guide §2.4 remove shuffles / §1.2 don't recompute)
    pre = pre.withColumn(
        "__sym",
        (
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(_SYMBOL_REGEX), 0))
            / F.greatest(F.size(F.col("__toks")), F.lit(1))
        ).cast("double"),
    )
    toks = F.col("__toks")

    def _tag(kind, item):
        return F.struct(F.lit(kind).alias("kind"), item.alias("item"))

    # a same-typed empty array (sequence(0, n) has INCLUSIVE bounds, so
    # it cannot express "no grams" for short docs on its own)
    empty = F.slice(F.array(_tag("B", F.lit(""))), 1, 0)

    def _grams(kind, n):
        gram = lambda i: _tag(
            kind,
            F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(1, n + 1)]
            ),
        )
        return F.when(
            F.size(toks) >= n,
            F.transform(F.sequence(F.lit(0), F.size(toks) - n), gram),
        ).otherwise(empty)

    # tagged items: L = raw lines, B = word bigrams, T = word trigrams
    items = F.concat(
        F.transform(F.col("__lines"), lambda x: _tag("L", x)),
        _grams("B", 2),
        _grams("T", 3),
    )
    exploded = pre.select(
        F.col(id_col), F.col("__sym"), F.explode(items).alias("e")
    ).select(
        id_col,
        "__sym",
        F.col("e.kind").alias("kind"),
        F.col("e.item").alias("item"),
    )
    counted = exploded.groupBy(id_col, "__sym", "kind", "item").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    chars = F.col("cnt") * F.length("item")
    per_kind = counted.groupBy(id_col, "__sym", "kind").agg(
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("distinct_n"),
        F.sum(chars).alias("total_chars"),
        F.sum(F.when(F.col("cnt") > 1, chars).otherwise(F.lit(0))).alias("dup_chars"),
        # chars covered by the MOST FREQUENT item (argmax by count,
        # ties to the larger coverage) — max_by keeps the aggregation
        # map-side combinable, unlike a rank window
        F.max_by(chars, F.struct(F.col("cnt"), chars)).alias("top_chars"),
    )

    def _kind(kind, col):
        return F.max(F.when(F.col("kind") == kind, col))

    stats = per_kind.groupBy(id_col, "__sym").agg(
        _kind("L", F.col("total")).alias("n_lines"),
        (
            (_kind("L", F.col("total")) - _kind("L", F.col("distinct_n")))
            / _kind("L", F.col("total"))
        ).cast("double").alias("dup_line_frac"),
        (
            _kind("L", F.col("dup_chars"))
            / F.greatest(_kind("L", F.col("total_chars")), F.lit(1))
        ).cast("double").alias("dup_line_char_frac"),
        F.coalesce(
            (
                _kind("B", F.col("top_chars"))
                / F.greatest(_kind("B", F.col("total_chars")), F.lit(1))
            ).cast("double"),
            F.lit(0.0),
        ).alias("top_bigram_char_frac"),
        F.coalesce(
            (
                _kind("T", F.col("dup_chars"))
                / F.greatest(_kind("T", F.col("total_chars")), F.lit(1))
            ).cast("double"),
            F.lit(0.0),
        ).alias("dup_trigram_char_frac"),
    )
    # same output schema/column order as the former stats-join-symbols
    # shape; __sym carried through the aggregations IS the ratio
    out = stats.select(
        id_col,
        "n_lines",
        "dup_line_frac",
        "dup_line_char_frac",
        "top_bigram_char_frac",
        "dup_trigram_char_frac",
        F.col("__sym").alias("symbol_word_ratio"),
    )
    t = REPETITION_THRESHOLDS
    return out.withColumn(
        "keep",
        (F.col("dup_line_frac") <= t["dup_line_frac"])
        & (F.col("dup_line_char_frac") <= t["dup_line_char_frac"])
        & (F.col("top_bigram_char_frac") <= t["top_bigram_char_frac"])
        & (F.col("dup_trigram_char_frac") <= t["dup_trigram_char_frac"])
        & (F.col("symbol_word_ratio") <= t["symbol_word_ratio"]),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document over the input corpus:
    ``score = tf * (ln((N + 1) / (df + 1)) + 1)`` (smoothed idf), with
    a deterministic tie-break (score desc, term asc).

    Scale shape: one explode into (doc, term) counts (map-side
    combined), document frequencies from a second aggregation of the
    SAME relation (term df = how many docs contain the term), a hash
    join back on term (vocabulary-sized relation — shuffled, not
    broadcast: at corpus scale the vocabulary does not fit a
    broadcast), and a per-document top-k window.  The corpus size N
    rides along as a broadcast scalar.

    The tf relation feeds TWO consumers (the df aggregation and the
    join's probe side), and Catalyst CANNOT share their exchange: the
    df consumer prunes the unused count column, rewriting its subtree
    to a distinct-style aggregate that no longer matches the tf
    subtree (verified in the r19 plan capture: two FileScans, two
    explodes, no ReusedExchange — the same finding recorded at
    ``duplicate_substring_spans``).  So tf is persisted for the call:
    postings-scale, MEMORY_AND_DISK spills rather than OOMs, and
    Spark's ContextCleaner unpersists when the returned plan is
    garbage collected — the same convention as ``decontaminate`` and
    ``duplicate_substring_spans``.  This halves the corpus scans and
    explodes per evaluation.
    """
    from pyspark import StorageLevel

    tf = (
        df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf")
            * (
                F.log((F.col("__n") + 1) / (F.col("df") + 1)) + F.lit(1.0)
            ),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(id_col, "term", "tf", "df", F.col("score").cast("double").alias("score"))
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Self-corpus unigram language-model score per document:
    ``avg_logprob = mean over token occurrences of ln(freq(term) /
    total_tokens)`` — the cheap "how surprising is this text"
    signal used to gate training data when no external LM is
    available (gibberish and boilerplate-free rare text score low,
    stopword soup scores high).

    Scale shape: one explode into token occurrences, a term-frequency
    aggregation (map-side combined), a hash join of occurrences back
    to the vocabulary-sized frequency relation, and one per-document
    average.  The total-token count rides along as a broadcast
    scalar.
    """
    occ = df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("term"))
    freqs = occ.groupBy("term").agg(F.count(F.lit(1)).alias("__tf"))
    total = occ.select(F.count(F.lit(1)).alias("__total"))
    return (
        occ.join(freqs, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(F.log(F.col("__tf") / F.col("__total"))).alias("avg_logprob"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 1.0,
) -> DataFrame:
    """Self-corpus bigram language-model score per document with
    add-``k`` smoothing: ``avg_logprob = mean over adjacent token
    pairs of ln((c(w1,w2) + k) / (c(w1) + k*V))`` where ``V`` is the
    corpus vocabulary size — the KenLM-shaped quality gate one order
    up from :func:`unigram_logprob` (word-salad text has plausible
    unigrams but improbable transitions).

    Documents with fewer than two tokens score NULL with
    ``n_bigrams = 0`` rather than disappearing.

    Scale shape: one projection builds the token array per row; bigram
    occurrences explode from it; the context and transition counts are
    two map-side combined aggregations; occurrences join back to the
    (vocabulary-sized) count relations by hash; ``V`` rides along as a
    broadcast scalar; one final per-document average.  No Python.
    """
    if k <= 0:
        raise ValueError("k must be > 0")
    toks = df.select(F.col(id_col), tokens_col(text_col).alias("__toks"))
    t = F.col("__toks")
    # sequence(1, n-1) would count DOWN for n < 2 — guard to empty
    idx = F.when(
        F.size(t) >= 2, F.sequence(F.lit(1), F.size(t) - 1)
    ).otherwise(F.array().cast("array<int>"))
    occ = toks.select(
        F.col(id_col),
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(t, i).alias("w1"),
                    F.element_at(t, i + 1).alias("w2"),
                ),
            )
        ).alias("__bi"),
    ).select(id_col, F.col("__bi.w1").alias("w1"), F.col("__bi.w2").alias("w2"))
    uni = toks.select(F.explode(t).alias("term"))
    c1 = uni.groupBy(F.col("term").alias("w1")).agg(
        F.count(F.lit(1)).alias("__c1")
    )
    vocab = uni.select(
        F.countDistinct("term").cast("double").alias("__v")
    )
    c2 = occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c2"))
    scored = (
        occ.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.avg(
                F.log(
                    (F.col("__c2") + F.lit(float(k)))
                    / (F.col("__c1") + F.lit(float(k)) * F.col("__v"))
                )
            ).alias("avg_logprob"),
        )
    )
    # re-attach documents that produced no bigrams
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .fillna({"n_bigrams": 0})
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split each document into overlapping windows of at most
    ``max_tokens`` whitespace tokens (stride ``max_tokens - overlap``)
    — the context-window chunking pass that precedes tokenization.

    Emits ``(id, chunk_idx, chunk_text, chunk_tokens)``; a document
    with no tokens yields one empty chunk so no document silently
    disappears.  Pure Catalyst: the token array is projected once per
    row, chunk starts come from ``sequence`` with the stride as step,
    and ``posexplode`` fans out — no Python, no shuffle beyond the
    explode itself.

    A start whose PREVIOUS chunk already reached the document end is
    dropped (``s > 1`` is kept only while ``s <= size - overlap``):
    when the end falls inside the overlap region, the raw stride
    sequence would emit a final chunk that is a strict SUBSET of the
    one before it — duplicated tail text injected into training data
    as a degenerate (< overlap tokens) chunk.
    """
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    # NULL text coalesces to '' so the documented one-empty-chunk
    # contract holds: a NULL __toks would otherwise propagate through
    # slice/array_join and emit (chunk_idx=0, chunk_text=NULL,
    # chunk_tokens=NULL) — NULLs leaking into downstream tokenization
    pre = df.select(
        F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias("__t")
    ).select(F.col(id_col), tokens_col("__t").alias("__toks"))
    toks = F.col("__toks")
    starts = F.filter(
        F.sequence(
            F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride)
        ),
        lambda s: (s == 1) | (s <= F.size(toks) - overlap),
    )
    chunks = F.transform(
        starts, lambda s: F.array_join(F.slice(toks, s, max_tokens), " ")
    )
    return pre.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text")
    ).withColumn(
        "chunk_tokens",
        F.when(F.col("chunk_text") == "", F.lit(0)).otherwise(
            F.size(F.split(F.col("chunk_text"), " "))
        ),
    )


def _merge_symbols(syms, a, b):
    """Replace every non-overlapping left-to-right (a, b) adjacency."""
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _bpe_train_local(vocab, num_merges, min_frequency):
    """Sennrich BPE merge loop over a word->freq dict (driver-side)."""
    words = [(list(w) + ["</w>"], f) for w, f in vocab.items()]
    merges = []
    for _ in range(num_merges):
        counts = {}
        for syms, f in words:
            for x, y in zip(syms, syms[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + f
        if not counts:
            break
        # deterministic: max count, ties -> lexicographically smallest
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_frequency:
            break
        a, b = best[0]
        merges.append((a, b))
        words = [(_merge_symbols(s, a, b), f) for s, f in words]
    return merges


def bpe_train(
    corpus: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_frequency: int = 2,
    driver_vocab_threshold: int = 1_000_000,
    checkpoint_dir: str = None,
):
    """Learn byte-pair-encoding merges from the corpus (Sennrich et al.
    2016, "Neural Machine Translation of Rare Words with Subword
    Units", arXiv:1508.07909).

    The corpus-sized work — reducing 100 TB of text to a word
    frequency table — is one explode + map-side-combined count.  The
    merge loop then runs over that vocabulary-sized relation: on the
    driver when the vocabulary fits (``driver_vocab_threshold``, the
    common case and what single-node tokenizer trainers do after the
    same reduction), otherwise distributed — each iteration is one
    JVM-side adjacent-pair count (explode + sum(freq)), a one-row
    argmax collect, and a vectorized merge application over the vocab
    with ``localCheckpoint`` breaking per-iteration lineage.  Both
    paths produce identical merges (regression-tested).

    Ties break deterministically: highest pair frequency, then
    lexicographically smallest pair.  Returns an ordered list of
    ``(left, right)`` merges.

    ``checkpoint_dir``: the distributed path's per-merge lineage cut
    is ``localCheckpoint`` by default — not fault-tolerant (a lost
    executor loses its blocks mid-loop).  On a real cluster pass an
    HDFS/S3 path to switch to reliable ``checkpoint()`` (see
    ``utils.misc.cut_lineage``).

    **Expected job count (distributed path)**: BPE's merge loop is
    inherently sequential — merge ``i+1``'s pair statistics depend on
    merge ``i`` having been applied — so each merge above the
    threshold costs one Spark job (pair-count aggregate + a ONE-ROW
    argmax collect; the collect moves a single (a, b, c) row, never
    data).  Training a GPT-2-class 32k-merge vocabulary this way is
    ~32k sequential jobs: at typical scheduler overhead that is hours
    of latency independent of data size, which is exactly why
    ``driver_vocab_threshold`` exists — after the corpus-sized
    reduction the word-frequency table for even multi-TB corpora is
    millions of rows (Heaps' law), it fits on the driver, and the
    merge loop runs there at in-memory speed like every single-node
    tokenizer trainer.  The distributed loop is the correctness
    escape hatch for vocabularies past driver memory, not the
    intended 100 TB path; both paths produce identical merges.
    """
    from pyspark import StorageLevel

    # persist: the corpus-sized explode+groupBy feeds BOTH the vocab
    # count and the collect / lineage-cut below — uncached it would
    # scan and aggregate the whole corpus twice
    words = (
        corpus.select(F.explode(tokens_col(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        n_vocab = words.count()
        if n_vocab == 0:
            return []
        if n_vocab <= driver_vocab_threshold:
            vocab = {r["w"]: r["freq"] for r in words.collect()}
            return _bpe_train_local(vocab, num_merges, min_frequency)

        # cut_lineage materializes eagerly, so the cache can be
        # released as soon as `cur` exists (the finally below)
        cur = cut_lineage(
            words.withColumn(
                "syms", F.concat(F.split("w", "(?!$)"), F.array(F.lit("</w>")))
            ).select("freq", "syms"),
            checkpoint_dir,
        )
    finally:
        words.unpersist()

    import pandas as pd
    merges = []
    for _ in range(num_merges):
        syms = F.col("syms")
        idx = F.when(
            F.size(syms) >= 2, F.sequence(F.lit(1), F.size(syms) - 1)
        ).otherwise(F.array().cast("array<int>"))
        # pairs stay a (left, right) struct end-to-end — string-packing
        # with a separator would crash or mis-split on tokens containing
        # the separator byte (raw web text does contain NULs), and the
        # (c desc, a asc, b asc) ordering matches the driver path's
        # (-count, (a, b)) tuple tie-break exactly
        pair = F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(syms, i).alias("a"),
                F.element_at(syms, i + 1).alias("b"),
            ),
        )
        counts = (
            cur.select("freq", F.explode(pair).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("c"))
        )
        top = counts.orderBy(
            F.desc("c"), F.asc("a"), F.asc("b")
        ).limit(1).collect()
        if not top or top[0]["c"] < min_frequency:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))

        def _make_apply(_a, _b):
            def _apply(col):
                return pd.Series(
                    [_merge_symbols(list(s), _a, _b) for s in col]
                )

            return _apply

        merge_udf = F.pandas_udf(_make_apply(a, b), "array<string>")
        prev = cur
        cur = cut_lineage(cur.withColumn("syms", merge_udf(syms)), checkpoint_dir)
        # the previous iteration's checkpoint is consumed — drop its
        # blocks now rather than accumulating every merge round's
        # storage until py4j GC catches up
        if checkpoint_dir is None:
            free_local_checkpoint(prev)
    return merges


def bpe_encode(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    merges=None,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize with learned BPE merges: per word, repeatedly merge the
    adjacent pair with the lowest merge rank (all left-to-right
    non-overlapping occurrences) until none applies.

    Arrow-batched pandas UDF — tokenization is inherently per-string
    Python here, so the hot loop memoizes by distinct word within each
    batch (natural text repeats words heavily) and the tiny ranks dict
    rides into executors in the UDF closure.  Emits the token array
    and ``n_bpe_tokens``.

    Word boundaries are the SAME as :func:`bpe_train`'s
    (``tokens_col``: lowercase + Java ``\\s+``, an ASCII whitespace
    class) — Python's ``str.split()`` would split on Unicode
    whitespace like U+00A0 and disagree with the vocabulary the
    merges were learned from.
    """
    import re as _re

    import pandas as pd

    ranks = {(a, b): i for i, (a, b) in enumerate(merges or [])}
    # Java \s used by tokens_col = [ \t\n\x0B\f\r] (ASCII only)
    ws = _re.compile(r"[ \t\n\x0b\f\r]+")

    def _enc_batch(col):
        memo = {}

        def enc_word(word):
            cached = memo.get(word)
            if cached is not None:
                return cached
            syms = list(word) + ["</w>"]
            while True:
                best_rank = None
                best_pair = None
                for x, y in zip(syms, syms[1:]):
                    r = ranks.get((x, y))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_pair = r, (x, y)
                if best_rank is None:
                    break
                syms = _merge_symbols(syms, *best_pair)
            memo[word] = syms
            return syms

        out = []
        for text in col:
            toks = []
            for w in ws.split((text or "").lower()):
                if w:
                    toks.extend(enc_word(w))
            out.append(toks)
        return pd.Series(out)

    enc = F.pandas_udf(_enc_batch, "array<string>")
    return df.select(
        F.col(id_col), enc(F.col(text_col)).alias(out_col)
    ).withColumn("n_bpe_tokens", F.size(F.col(out_col)))


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: Optional[str] = None,
    unicode_form: Optional[str] = None,
    lowercase: bool = True,
    collapse_whitespace: bool = True,
    strip: bool = True,
) -> DataFrame:
    """Canonicalize a text column — the step dedup pipelines run
    BEFORE hashing so that byte-level variants of the same content
    (case, runs of whitespace, combining-character encodings) collide.

    ``lowercase`` / ``collapse_whitespace`` / ``strip`` are pure
    Catalyst (lower / regexp_replace / trim — codegen'd, scan-speed).
    ``unicode_form`` ("NFC", "NFKC", "NFD", "NFKD") applies Unicode
    normalization via an Arrow-batched pandas UDF over stdlib
    ``unicodedata`` — the one sub-step Catalyst cannot express; omit
    it (None) to stay Python-free.  NULL text stays NULL.
    """
    if unicode_form is not None and unicode_form not in (
        "NFC", "NFKC", "NFD", "NFKD"
    ):
        raise ValueError(f"unknown unicode_form {unicode_form!r}")
    out_col = out_col or text_col
    col = F.col(text_col)
    if unicode_form is not None:
        from pyspark.sql.functions import pandas_udf

        form = unicode_form

        def _norm_series(s):
            import unicodedata

            return s.map(
                lambda v: unicodedata.normalize(form, v) if v is not None else None
            )

        # hint-free form: `from __future__ import annotations` would
        # stringify pd.Series hints beyond pandas_udf's resolver
        col = pandas_udf(_norm_series, "string")(col)
    if lowercase:
        col = F.lower(col)
    if collapse_whitespace:
        col = F.regexp_replace(col, r"\s+", " ")
    if strip:
        col = F.trim(col)
    return df.withColumn(out_col, col)
