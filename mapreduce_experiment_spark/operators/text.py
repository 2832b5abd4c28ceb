"""Text-analysis operators for LLM-data pipelines over ``documents``.

All pure-expression (tokenize/regex/higher-order functions — no UDFs,
so the whole suite stays in whole-stage codegen and scales linearly):

- language ID: stopword-hit scoring across candidate languages
  (n-gram-heuristic family; deterministic argmax with fixed tie order)
- quality scoring: length / alpha-ratio / stopword-ratio / mean token
  length combined into a bounded score
- token counting: whitespace words plus a BPE-ish regex segmentation
  (alnum runs + single punctuation marks)
- fingerprinting: min-hash over rolling word 5-grams (winnowing-style
  single-value document fingerprint)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import tokenize, word_ngrams

# Fixed stopword inventories (shared with the oracle SQL).
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "los", "por"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "du", "est", "dans"),
}
LANGS = tuple(STOPWORDS)  # fixed order = deterministic tie-break

# Whitespace is spelled out instead of `\s` because the engines
# disagree on it: Java's default `\s` is [ \t\n\x0B\f\r] while
# DuckDB's RE2 `\s` is [ \t\n\f\r] — WITHOUT vertical tab — so a
# U+000B in the text made the oracle count one extra segment (r14
# adversarial rehearsal, reproduced live). The explicit class is
# Java's set, so Spark-side values are unchanged and both engines
# now agree. Pinned by test_token_and_quality_survive_dirty_text.
BPE_ISH = "[a-z0-9]+|[^a-z0-9 \\t\\n\\r\\f\\x0b]"


def _hits(tokens: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*words))).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokenize(text)
    return {lang: _hits(toks, words) for lang, words in STOPWORDS.items()}


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Predict language by stopword hits; ties resolve in LANGS order,
    zero hits → 'und' (undetermined). NULL text folds into the
    empty-string case (zero hits everywhere → 'und') — unguarded, the
    hit counts were NULL and the when-chain fell through to a NULL
    pred_lang bucket (r13 text review, deferred to r14); the same
    convention quality_features uses."""
    scores = lang_scores(F.coalesce(F.col(text_col), F.lit("")))
    best = F.greatest(*[scores[lg] for lg in LANGS])
    pred = F.when(best == 0, F.lit("und"))
    for lg in LANGS:
        pred = pred.when(scores[lg] == best, F.lit(lg))
    cols = [scores[lg].alias(f"hits_{lg}") for lg in LANGS]
    return docs.select("doc_id", *cols, pred.alias("pred_lang"))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features + a bounded composite score.

    All ratios come from integer counts quantized with floor(+0.5), so
    the values are cross-engine deterministic.
    """
    # NULL text folds into the empty-string case (r13 review: NULL
    # propagated through every feature, and F.least SKIPS null
    # operands, so a null-text doc scored a PERFECT 1.0 and sailed
    # through quality_filter's null-comparison when-chain as 'kept').
    # As '' it takes the ordinary path: one phantom token, zero
    # ratios, score 0.0, reason 'too_short'.
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokenize(text)
    n_chars = F.length(text).cast("long")
    n_alpha = F.length(F.regexp_replace(F.lower(text), "[^a-z]", "")).cast("long")
    n_tokens = F.size(toks).cast("long")
    n_stop = _hits(toks, STOPWORDS["en"])
    total_tok_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    q6 = lambda c: F.floor(c * 1_000_000 + 0.5) / 1_000_000.0  # noqa: E731
    # Zero-guard: ANSI-on Spark 4 (the session default) hard-fails
    # the division on an empty doc instead of scoring it (r13 review,
    # reproduced live); an empty doc is simply zero-alpha. n_tokens
    # needs no guard — tokenize('') yields [''], so it is never 0.
    alpha_ratio = q6(F.when(n_chars == 0, F.lit(0.0))
                     .otherwise(n_alpha.cast("double") / n_chars))
    stop_ratio = q6(n_stop.cast("double") / n_tokens)
    mean_tok_len = q6(total_tok_chars.cast("double") / n_tokens)
    # Bounded composite: rewards alpha-heavy, stopword-bearing prose
    # with mid-length tokens (heuristic in the C4/Gopher-rules family).
    score = q6(
        F.least(alpha_ratio * 0.5 + stop_ratio * 2.0
                + F.least(mean_tok_len / 10.0, F.lit(0.3)), F.lit(1.0))
    )
    return docs.select(
        "doc_id", n_chars.alias("n_chars"), n_tokens.alias("n_tokens"),
        alpha_ratio.alias("alpha_ratio"), stop_ratio.alias("stop_ratio"),
        mean_tok_len.alias("mean_tok_len"), score.alias("quality_score"),
    )


def quality_filter(docs: DataFrame, min_tokens: int = 10,
                   min_alpha: float = 0.70, min_stop: float = 0.02,
                   min_score: float = 0.55,
                   text_col: str = "text") -> DataFrame:
    """Keep/drop verdict per doc with a FIRST-FAILING-RULE reason —
    the audit trail a production filter chain emits so drop rates are
    attributable per rule (C4/Gopher-rules family).

    All inputs are the q6-quantized :func:`quality_features` values
    (bit-identical across engines), so the threshold comparisons are
    deterministic; the rule ORDER is part of the contract (a doc
    failing several rules reports the first).
    """
    f = quality_features(docs, text_col)
    reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("alpha_ratio") < min_alpha, F.lit("low_alpha"))
        .when(F.col("stop_ratio") < min_stop, F.lit("low_stopword"))
        .when(F.col("quality_score") < min_score, F.lit("low_score"))
        .otherwise(F.lit("kept"))
    )
    return f.select(
        "doc_id", "n_tokens", "quality_score",
        reason.alias("reason"), (reason == "kept").alias("keep"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens vs BPE-ish regex segments (alnum runs +
    individual punctuation)."""
    text = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(tokenize(text)).cast("long").alias("n_words"),
        F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_ISH), 0))
         .cast("long").alias("n_bpe_ish"),
    )


PACK_CAPACITY = 2048
PACK_SHARDS = 8


def pack_sequences(docs: DataFrame, capacity: int = PACK_CAPACITY,
                   n_shards: int = PACK_SHARDS, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Pack documents into fixed token-budget training sequences —
    the assembly step between a cleaned corpus and a trainer's
    dataloader.

    Deterministic streaming next-fit: docs are sharded by
    ``hash60(id) % n_shards``, ordered within the shard by (hash, id)
    — a stable pseudo-shuffle, so the mixing order is a pure function
    of the ids (restart-safe, rerun-identical, no RNG state) — then a
    per-shard running token total places each doc at
    ``seq_id = floor(start / capacity)``, ``seq_offset = start %
    capacity``. A doc whose tokens straddle a boundary belongs to the
    sequence where it STARTS (may overflow by < its own length — the
    standard streaming-pack semantics; the trainer truncates or
    spills the tail).

    Scale shape: one shuffle on ``shard``; each shard's window cumsum
    runs independently, so parallelism = ``n_shards`` (thousands at
    100 TB — here 8 so sf0.01 exercises multi-doc sequences). All
    arithmetic is integer — ``seq_id`` uses true integer division
    (Spark ``DIV``, oracle ``//``), never a double round-trip, so the
    cross-engine hash-exactness claim holds for the full int64 range,
    not just below 2^53.
    """
    if int(capacity) < 1:
        raise ValueError("capacity must be >= 1 (token budget per "
                         "sequence; DIV 0 is an ANSI hard-fail)")
    return _pack_starts(docs, n_shards, id_col, text_col).select(
        id_col, "n_tokens", "shard",
        F.expr(f"_start DIV {int(capacity)}").alias("seq_id"),
        (F.col("_start") % capacity).alias("seq_offset"),
    )


def _pack_starts(docs: DataFrame, n_shards: int, id_col: str,
                 text_col: str) -> DataFrame:
    """Shared packing core: per-doc running token ``_start`` within its
    hash shard (see :func:`pack_sequences` for the ordering contract)."""
    from pyspark.sql import Window

    from ..functions.textfns import hash60

    # n_shards < 1: `% 0` is an ANSI hard-fail, negative shards a
    # nonsensical partitioning (r14 second-pass review).
    if int(n_shards) < 1:
        raise ValueError("n_shards must be >= 1")
    h = hash60(F.col(id_col).cast("string"))
    # NULL text folds into the empty-string case (one phantom ''
    # token), the repo-wide convention: unguarded, pack_sequences
    # emitted a NULL-n_tokens row (and poisoned every later _start in
    # the shard) while pack_sequence_fragments dropped the doc — the
    # two views disagreed on corpus membership (r13 text review,
    # deferred to r14).
    t = docs.select(
        F.col(id_col),
        F.size(tokenize(F.coalesce(F.col(text_col), F.lit(""))))
         .cast("long").alias("n_tokens"),
        h.alias("_h"),
        (h % n_shards).alias("shard"),
    )
    w = (Window.partitionBy("shard").orderBy("_h", id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return t.select(id_col, "n_tokens", "shard", start.alias("_start"))


def pack_sequence_fragments(docs: DataFrame, capacity: int = PACK_CAPACITY,
                            n_shards: int = PACK_SHARDS,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Boundary-splitting sequence packing: the trainer-facing variant
    of :func:`pack_sequences`.

    Where ``pack_sequences`` assigns a straddling doc to the sequence
    it STARTS in (and lets the trainer spill the tail),
    this emits one row per (doc, sequence) FRAGMENT: a doc occupying
    token interval ``[start, start + n_tokens)`` is split at every
    multiple of ``capacity``, yielding ``(doc_id, shard, seq_id,
    frag_offset, frag_len)`` with the invariants

    - per-doc ``sum(frag_len) == n_tokens``,
    - ``0 <= frag_offset`` and ``frag_offset + frag_len <= capacity``
      (no fragment crosses a boundary),
    - consecutive fragments of a doc tile adjacent sequences.

    Zero-token docs are dropped (nothing to train on). The fan-out is
    ``F.sequence`` over the spanned seq range + ``explode`` — pure
    expressions, and the explosion factor per doc is
    ``ceil(n_tokens / capacity) + 1`` at most, so the output is
    ~``total_tokens / capacity`` rows regardless of doc skew. All
    arithmetic integer (``DIV`` both sides).
    """
    c = int(capacity)
    if c < 1:
        raise ValueError("capacity must be >= 1 (token budget per "
                         "sequence; DIV 0 is an ANSI hard-fail)")
    t = _pack_starts(docs, n_shards, id_col, text_col).where(
        F.col("n_tokens") > 0)
    f = t.select(
        id_col, "shard", "_start", "n_tokens",
        F.explode(F.sequence(
            F.expr(f"_start DIV {c}"),
            F.expr(f"(_start + n_tokens - 1) DIV {c}"),
        )).alias("seq_id"),
    )
    frag_from = F.greatest(F.col("_start"), F.col("seq_id") * c)
    frag_to = F.least(F.col("_start") + F.col("n_tokens"),
                      (F.col("seq_id") + 1) * c)
    return f.select(
        id_col, "shard", "seq_id",
        (frag_from - F.col("seq_id") * c).alias("frag_offset"),
        (frag_to - frag_from).alias("frag_len"),
    )


def contamination_pairs(docs: DataFrame, eval_mod: int = 50,
                        min_shared: int = 3, n: int = 5,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: (train doc, eval doc) pairs sharing
    ≥ ``min_shared`` distinct word ``n``-grams — the overlap check a
    training corpus runs against every eval benchmark before training.

    Here the "benchmark" is the deterministic slice ``id % eval_mod
    == 0`` of the corpus itself (the test dirs carry no separate eval
    table; at deployment the eval side is the real benchmark corpus).

    Scale shape: eval sets are benchmark-sized (thousands of docs), so
    the eval shingle table BROADCASTS; the corpus side explodes its
    shingles map-side and probes the broadcast hash — the 100 TB side
    never shuffles its text, and the only shuffle is the (train, eval)
    pair count, bounded by actual collisions. Integer hash counts →
    cross-engine exact.
    """
    from ..functions.textfns import hash60, shingles, tokenize as tok

    # eval_mod < 1: `% 0` is an ANSI hard-fail mid-scan (r14
    # second-pass review).
    if int(eval_mod) < 1:
        raise ValueError("eval_mod must be >= 1")
    # Token array materialized BELOW the explode: the shingle
    # expression references it three times (guard size, sequence
    # size, slice) and Generate inlines its generator — without the
    # projection the regex tokenizer runs thrice per corpus row.
    t = docs.select(F.col(id_col), tok(F.col(text_col)).alias("_toks"))
    h = t.select(
        F.col(id_col),
        F.explode(F.transform(shingles(F.col("_toks"), n), hash60))
         .alias("g"))
    ev = h.where(F.col(id_col) % eval_mod == 0).select(
        F.col(id_col).alias("eval_doc_id"), "g")
    tr = h.where(F.col(id_col) % eval_mod != 0).select(
        F.col(id_col).alias("train_doc_id"), "g")
    return (
        tr.join(F.broadcast(ev), "g")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
        .where(F.col("n_shared_grams") >= min_shared)
    )


def contamination_pairs_external(train_docs: DataFrame,
                                 eval_docs: DataFrame,
                                 min_shared: int = 3, n: int = 5,
                                 train_id_col: str = "doc_id",
                                 train_text_col: str = "text",
                                 eval_id_col: str = "eval_id",
                                 eval_text_col: str = "prompt") -> DataFrame:
    """Decontamination against a genuinely EXTERNAL eval corpus.

    :func:`contamination_pairs` carves its "benchmark" out of the
    corpus itself (``id % eval_mod``); this is the deployment shape —
    the eval side is a separate table with its own schema (here a
    string ``eval_id`` + ``prompt``, deliberately different column
    names/types from the train side, so train/eval schema drift is
    exercised, not assumed away).

    Same scale shape: the benchmark-sized eval shingle table
    BROADCASTS; the 100 TB train side explodes its shingles map-side
    and probes the broadcast hash; only actual collision pairs
    shuffle into the final count.
    """
    from ..functions.textfns import hash60, shingles, tokenize as tok

    def _grams(df: DataFrame, idc: str, alias: str, txt: str) -> DataFrame:
        # Same materialize-below-the-explode shape as
        # contamination_pairs: one tokenizer run per row.
        t = df.select(F.col(idc).alias(alias), tok(F.col(txt)).alias("_toks"))
        return t.select(
            alias,
            F.explode(F.transform(shingles(F.col("_toks"), n), hash60))
             .alias("g"))

    tr = _grams(train_docs, train_id_col, "train_doc_id", train_text_col)
    ev = _grams(eval_docs, eval_id_col, "eval_id", eval_text_col)
    return (
        tr.join(F.broadcast(ev), "g")
        .groupBy("train_doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
        .where(F.col("n_shared_grams") >= min_shared)
    )


def tfidf_pairs(docs: DataFrame, threshold: float = 0.5,
                max_df: int = 100, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Document-pair cosine similarity over TF-IDF weights.

    Inverted-index formulation: pairs are generated per TERM (join on
    the term), never as a doc×doc product — the classic IR trick that
    keeps 100 TB feasible. Terms with document frequency > ``max_df``
    are pruned first (an integer, cross-engine-exact condition): high-
    df terms contribute least weight but dominate the per-term join's
    quadratic cost.

    idf = ln(N/df); weights/norms are floats but every input is
    identical across engines, and outputs are 6dp-quantized.
    """
    toks = docs.select(
        id_col, F.explode(tokenize(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # N rides in the plan as a broadcast 1-row aggregate (a scalar
    # subquery shape) — no driver action anywhere in the operator.
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    w = (
        tf.join(df_, "term")
        .where(F.col("df") <= max_df)
        .crossJoin(F.broadcast(n_docs))
        .select(id_col, "term",
                (F.col("tf") * F.log(F.col("_n") / F.col("df")))
                .alias("w"))
    )
    norm = w.groupBy(id_col).agg(F.sqrt(F.sum(F.col("w") * F.col("w")))
                                 .alias("norm"))
    wa = (w.join(norm, id_col)
          .select(F.col(id_col).alias("id_a"), "term",
                  F.col("w").alias("wa"), F.col("norm").alias("na")))
    wb = (w.join(norm, id_col)
          .select(F.col(id_col).alias("id_b"), "term",
                  F.col("w").alias("wb"), F.col("norm").alias("nb")))
    dots = (
        wa.join(wb, "term")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    # Zero-norm guard (r13 review, reproduced live): a doc whose
    # surviving terms all have df == N gets idf 0 everywhere, hence
    # norm 0, and ANSI-on Spark 4 hard-failed the division for every
    # pair it appears in. Degenerate docs carry no tf-idf signal —
    # score their pairs 0, below any meaningful threshold.
    sim = F.floor(F.when(F.col("na") * F.col("nb") == 0, F.lit(0.0))
                  .otherwise(F.col("dot") / (F.col("na") * F.col("nb")))
                  * 1_000_000 + 0.5) / 1_000_000.0
    return (
        dots.select("id_a", "id_b", sim.alias("tfidf_cosine"))
        .where(F.col("tfidf_cosine") >= threshold)
    )


def repetition_scores(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Intra-document repetition metrics (Gopher-rules family): the
    quality signal that catches boilerplate/SEO spam which LENGTH and
    stopword ratios miss.

    Per doc: token type-token stats (distinct tokens, most-frequent
    token count) and the same over word BIGRAM occurrences (NOT the
    distinct shingle set — repetition needs occurrence counts), plus
    q6-quantized top-token / top-bigram fractions. High
    ``top_bigram_frac`` ⇒ a phrase loops through the doc.

    Shape: explode → two-level hash aggregate; both levels combine
    map-side, so the shuffle carries one row per (doc, distinct gram),
    bounded by doc content not corpus size. Integer counts →
    cross-engine exact; ratios quantized like the other text ops.
    """
    toks = docs.select(id_col, F.explode(tokenize(F.col(text_col)))
                       .alias("tok"))
    tok_counts_ = (
        toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.sum("c").alias("n_tokens"),
             F.count(F.lit(1)).alias("distinct_tokens"),
             F.max("c").alias("top_token_n"))
    )
    t = docs.select(id_col, tokenize(F.col(text_col)).alias("toks"))
    grams = t.select(
        id_col,
        F.explode(word_ngrams(F.col("toks"), 2)).alias("gram"),
    )
    gram_counts = (
        grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.sum("c").alias("n_bigrams"),
             F.count(F.lit(1)).alias("distinct_bigrams"),
             F.max("c").alias("top_bigram_n"))
    )
    q6 = lambda c: F.floor(c * 1_000_000 + 0.5) / 1_000_000.0  # noqa: E731
    out = tok_counts_.join(gram_counts, id_col, "left")
    zed = [F.coalesce(F.col(c), F.lit(0)).alias(c)
           for c in ("n_bigrams", "distinct_bigrams", "top_bigram_n")]
    out = out.select(id_col, "n_tokens", "distinct_tokens", "top_token_n",
                     *zed)
    return out.select(
        "*",
        q6(F.col("top_token_n").cast("double") / F.col("n_tokens"))
            .alias("top_token_frac"),
        F.when(F.col("n_bigrams") > 0,
               q6(F.col("top_bigram_n").cast("double") / F.col("n_bigrams")))
            .otherwise(F.lit(0.0)).alias("top_bigram_frac"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text",
                 n: int = 5) -> DataFrame:
    """Single-value rolling-hash fingerprint: min 60-bit hash over
    word n-grams (n=5). Equal fingerprints ⇒ near-identical prefixes
    of content; used for cheap shard-level dedup sweeps.

    r18 optimization round: computed via the exploded codegen path
    (posexplode + window leads + hash → min aggregate — the same
    machinery MinHash uses, dedup.exploded_shingle_hashes) instead of
    ``array_min(transform(shingles(...)))`` + an isNotNull filter.
    The HOF form ran interpreted (higher-order functions exit
    whole-stage codegen, so no common-subexpression elimination:
    tokenize re-split the text several times per evaluation) AND the
    pushed-down NULL filter evaluated the entire fingerprint
    expression a second time below the projection (two interpreted
    full evaluations per doc, plans/r18/fingerprints_before.txt
    operators (3)+(4)); on the single-row-group local scan that was
    one task doing everything — measured 12.2 s wall ≈ 11.6 s CPU.
    The exploded form is whole-stage codegen, hashes each gram once,
    and parallelizes past the exchange. Values identical: same gram
    strings (pinned bit-equal for MinHash), min is
    duplicate-insensitive (the HOF path array_distinct'ed, the
    exploded path does not), and docs with < n tokens emit no rows —
    exactly the rows the old isNotNull filter dropped.

    Assumes ``doc_id`` is unique per document (true for every corpus
    this repo loads, and what the oracle checks): the groupBy
    collapses duplicate ids to ONE row carrying the min across all
    their texts, where the pre-r18 per-row projection emitted one
    fingerprint row per input row (r18 ADVICE)."""
    from .dedup import exploded_shingle_hashes

    return (exploded_shingle_hashes(docs, "doc_id", text_col, n)
            .groupBy("doc_id")
            .agg(F.min("h").alias("fingerprint")))


CHUNK_CHARS = 200
CHUNK_OVERLAP = 50


def chunk_documents(docs: DataFrame, chunk_chars: int = CHUNK_CHARS,
                    overlap: int = CHUNK_OVERLAP, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Sliding-window document chunking — the ingest step that turns a
    corpus into retrieval/embedding-sized pieces (RAG prep, context-
    window packing, chunk-level dedup all start here).

    One chunk every ``stride = chunk_chars - overlap`` characters;
    consecutive chunks share ``overlap`` characters so no boundary
    ever splits content without a covering neighbor. The last chunk
    is the first one whose window reaches the end of the doc (it may
    be shorter than ``chunk_chars``); a doc no longer than one window
    yields exactly one chunk. Chunk count per doc is
    ``1 + ceil(max(len - chunk_chars, 0) / stride)`` — computed with
    POSITIVE-operand integer division only (Spark ``DIV`` truncates,
    DuckDB ``//`` floors; they agree only for non-negative operands,
    so the ``len <= chunk_chars`` case is handled by CASE, not by
    division of a negative numerator).

    Shape: ``sequence`` + ``explode`` + ``substring`` — pure codegen
    expressions, embarrassingly parallel, fan-out per doc is
    ~``len / stride`` rows regardless of doc-length skew.
    """
    # Parameter guards (r13 text review, deferred to r14): a negative
    # overlap silently produced stride > chunk_chars — windows with
    # UNCOVERED gaps between them, the exact failure the overlap
    # contract exists to prevent; chunk_chars <= 0 made the substring
    # width nonsensical.
    if int(chunk_chars) <= 0:
        raise ValueError("chunk_chars must be positive")
    if int(overlap) < 0:
        raise ValueError(
            "overlap must be >= 0 (negative overlap leaves uncovered "
            "gaps between consecutive chunks)")
    if overlap >= chunk_chars:
        raise ValueError("overlap must be < chunk_chars")
    stride = int(chunk_chars) - int(overlap)
    c = int(chunk_chars)
    # The DIV expression references a FIXED internal alias, never the
    # caller's text_col name (r13 text review: raw interpolation into
    # F.expr broke on any column name needing quoting).
    length = F.length(F.col(text_col))
    last_i = F.when(length <= c, F.lit(0)).otherwise(
        F.expr(f"(`__chunk_len` - {c} + {stride} - 1) DIV {stride}"))
    t = docs.select(
        F.col(id_col), F.col(text_col), length.alias("__chunk_len"),
    ).select(
        F.col(id_col), F.col(text_col),
        F.explode(F.sequence(F.lit(0), last_i)).alias("chunk_id"))
    start = (F.col("chunk_id") * stride + 1).cast("long")
    chunk = F.substring(F.col(text_col), start, c)
    return t.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.alias("chunk_start"),
        F.length(chunk).cast("long").alias("chunk_len"),
        chunk.alias("chunk_text"),
    )


def ngram_counts(docs: DataFrame, n: int = 3, top_n: int = 200,
                 text_col: str = "text") -> DataFrame:
    """Corpus-level word n-gram OCCURRENCE counts (LM-counts flavor):
    the top ``top_n`` n-grams by frequency, ties broken by gram text.

    Unlike the dedup shingle path this does NOT de-duplicate grams
    within a doc — language-model count tables need occurrences.

    Shape: the wordcount shape one level up — explode n-grams → hash
    aggregate with map-side partial combine (the shuffle carries one
    row per (partition, distinct gram), not per occurrence) → global
    top-N via TakeOrdered. 100 TB-safe: no all-gram sort, the only
    full-width state is the per-partition partial map.

    The token array is materialized in its own projection BELOW the
    explode: the gram expression references it three times (two
    ``size``, one ``slice``), and inlining would re-run the regex
    tokenizer thrice per row (Catalyst's CollapseProject keeps
    non-cheap multi-referenced aliases separate; measured ~1.6× on
    the corpus scan).
    """
    t = docs.select(tokenize(F.col(text_col)).alias("toks"))
    grams = word_ngrams(F.col("toks"), n)
    counts = (
        t.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.orderBy(F.col("n").desc(), F.col("gram"))
        .limit(int(top_n))
        .select("gram", "n")
    )


# BM25 constants; repr() of these exact doubles is embedded in the
# oracle SQL so both engines evaluate the same IEEE values.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10


def bm25_topk(docs: DataFrame, queries: DataFrame, k1: float = BM25_K1,
              b: float = BM25_B, top_k: int = BM25_TOP_K,
              id_col: str = "doc_id", text_col: str = "text",
              query_id_col: str = "query_id",
              query_text_col: str = "qtext") -> DataFrame:
    """BM25 retrieval: top-``top_k`` documents per query (Robertson/
    Sparck Jones probabilistic ranking — the lexical-retrieval
    baseline every RAG/data-curation stack ships).

    ``score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))``
    with ``idf = ln(1 + (N-df+0.5)/(df+0.5))`` (the non-negative
    Lucene form). Document frequency is computed over the corpus
    (restricted to query terms — df of a term is the same whether or
    not other terms are counted), so pruning to the broadcast query
    vocabulary FIRST costs nothing semantically and everything in
    shuffle volume.

    Cross-engine determinism: each per-term contribution is quantized
    to integer micro-units BEFORE summation, so the score sum is
    exact int64 arithmetic — no float-accumulation-order hazard (the
    lesson of the r3 percentile ADVICE applied up front). The only
    float step is the identical scalar expression both engines
    evaluate per (doc, term).

    Scale shape: query sets are benchmark-sized → the query-term
    table broadcasts twice (vocabulary semi-join, score fan-out); the
    corpus side reduces to (doc, matched-term) rows map-side; the
    final top-k is a per-query TakeOrdered window over only matched
    docs. The 100 TB side never shuffles text.
    """
    # Parameter domain guards (r14 second-pass review — the
    # chunk_documents guard class): b > 1 makes the length-norm term
    # 1-b+b·dl/avgdl cross zero for short docs, so the per-term
    # weight divides by zero (ANSI hard-fail mid-job) or flips sign;
    # k1 < 0 the same. The BM25 contract is b ∈ [0, 1], k1 >= 0.
    if not 0.0 <= float(b) <= 1.0:
        raise ValueError("b must be in [0, 1] (BM25 length-normalization "
                         "slope; outside it the score denominator can "
                         "reach zero)")
    if float(k1) < 0.0:
        raise ValueError("k1 must be >= 0")
    k1p1 = float(k1) + 1.0
    one_minus_b = 1.0 - float(b)
    # Zero-length terms are filtered on BOTH sides (r13 text review,
    # deferred to r14): tokenize('') yields the phantom '' token, so
    # an empty or punctuation-only QUERY matched every empty DOCUMENT
    # and retrieved them rank-1 (idf of '' is high precisely because
    # almost no doc is empty). The corpus-side filter also keeps ''
    # rows out of the explode → vocab join even when a degenerate
    # query slips through.
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(tokenize(F.col(query_text_col))))
         .alias("term")).where(F.length("term") > 0)
    vocab = qterms.select("term").distinct()
    # One tokenized base projection; dl (doc token length) rides
    # THROUGH the explode as a carried column, so no corpus-sized
    # doc_id join is ever needed to reattach it — at 100 TB that join
    # would shuffle the whole corpus's doc list. (The token array is
    # materialized below the explode for single tokenizer evaluation,
    # same as the other n-gram operators.)
    t = docs.select(F.col(id_col).alias("doc_id"),
                    tokenize(F.col(text_col)).alias("_toks"))
    base = t.select(
        "doc_id",
        F.size("_toks").cast("long").alias("dl"),
        F.explode("_toks").alias("term")).where(F.length("term") > 0)
    tfq = (base.join(F.broadcast(vocab), "term")
           .groupBy("doc_id", "dl", "term")
           .agg(F.count(F.lit(1)).alias("tf")))
    dfr = tfq.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # Corpus stats (N, avgdl) need ALL docs — including ones matching
    # no query term — so they are a separate 1-row aggregate pass (at
    # deployment: corpus metadata computed once, a broadcast scalar).
    stats = t.agg(F.count(F.lit(1)).cast("double").alias("_n"),
                  F.avg(F.size("_toks").cast("long")).alias("_avgdl"))
    idf = F.log(1.0 + (F.col("_n") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    denom = F.col("tf") + F.lit(float(k1)) * (
        F.lit(one_minus_b) + F.lit(float(b))
        * (F.col("dl") / F.col("_avgdl")))
    w_micro = F.floor(idf * ((F.col("tf") * F.lit(k1p1)) / denom)
                      * 1_000_000 + 0.5).cast("long")
    # dfr is query-vocabulary-sized (tiny): broadcast it explicitly so
    # a stats misestimate can never shuffle the corpus-sized tf table
    # on `term` — a skewed key at 100 TB (stopword-ish query terms
    # concentrate most of the corpus rows on a handful of terms).
    w = (tfq.join(F.broadcast(dfr), "term")
         .crossJoin(F.broadcast(stats))
         .select("doc_id", "term", w_micro.alias("w_micro")))
    scored = (w.join(F.broadcast(qterms), "term")
              .groupBy("query_id", "doc_id")
              .agg(F.sum("w_micro").alias("score_micro")))
    from pyspark.sql import Window
    rank = F.row_number().over(
        Window.partitionBy("query_id")
        .orderBy(F.col("score_micro").desc(), "doc_id"))
    return (scored.select("query_id", "doc_id", "score_micro",
                          rank.cast("long").alias("rank"))
            .where(F.col("rank") <= int(top_k)))
