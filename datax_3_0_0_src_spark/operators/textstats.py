"""Text analysis operators for large-scale training-data pipelines.

Token counting, quality scoring, language-ID (stopword heuristic), and
document fingerprinting (polynomial rolling hash) — all pure Column
expressions (JVM-side, whole-stage codegen; no Python in the hot path), each
with an exact DuckDB-SQL oracle equivalent (integer/fold arithmetic chosen to
be reproducible across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FP_MOD = 1_000_000_007

# tiny per-language marker sets (deterministic heuristic, not a real model)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "de", "y"],
}

STOPWORDS = ["the", "a", "of", "to", "in", "and", "is", "on", "for", "it"]


def _tokens(col: str = "text"):
    return F.split(F.trim(F.col(col)), r"\s+")


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Rows: id, n_tokens, n_chars, n_distinct_tokens, avg_token_len."""
    toks = _tokens(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
            / F.size(toks),
            6,
        ).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length/stopword/distinctness heuristics -> a deterministic [0,1] score."""
    toks = _tokens(text_col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / n
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    score = F.round(0.3 * stop_ratio + 0.4 * distinct_ratio + 0.3 * len_score, 6)
    return df.select(
        F.col(id_col),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(len_score, 6).alias("length_score"),
        score.alias("quality_score"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word counts per language + argmax prediction (fixed tie order)."""
    toks = _tokens(text_col)

    def count_in(words):
        arr = F.array(*[F.lit(w) for w in words])
        # nb: single-param lambda — pyspark infers HOF arity from the signature
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    counts = {lang: count_in(markers) for lang, markers in LANG_MARKERS.items()}
    # argmax with fixed tie-break order en > de > fr > es
    en, de, fr, es = counts["en"], counts["de"], counts["fr"], counts["es"]
    mx = F.greatest(en, de, fr, es)
    pred = (
        F.when(mx == 0, F.lit("unknown"))
        .when(en == mx, F.lit("en"))
        .when(de == mx, F.lit("de"))
        .when(fr == mx, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return df.select(
        F.col(id_col),
        en.alias("en_n"), de.alias("de_n"), fr.alias("fr_n"), es.alias("es_n"),
        pred.alias("pred_lang"),
    )


# GPT-2-style pre-tokenizer shape, ASCII subset (identical RE2/Java regex
# semantics cross-engine): contractions, letter runs, digit runs, punct runs —
# each optionally preceded by one space (the BPE "merge with leading space")
BPE_ISH_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"


def bpe_token_count(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token counting the way an LLM-data pipeline sizes its corpus: both the
    whitespace count and a BPE-ish regex pre-tokenization count (the standard
    ~chars/4 sanity anchor), plus their ratio. Pure Column expressions."""
    ws = F.size(_tokens(text_col))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_RE), F.lit(0)))
    return df.select(
        F.col(id_col),
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        F.round(bpe / ws, 6).alias("bpe_per_word"),
    )


def word_hash_expr(word):
    """Cross-engine word hash: left fold over code points, mod 1e9+7.

    DuckDB twin: list_reduce(list_prepend(0, list_transform(string_split(w,''),
    c -> ascii(c))), (acc, x) -> (acc*31 + x) % 1000000007)
    """
    chars = F.split(word, "")
    return F.aggregate(
        F.filter(chars, lambda c: F.length(c) > 0),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % FP_MOD,
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprint: rolling hash over token hashes (order-sensitive)."""
    toks = _tokens(text_col)
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 131 + word_hash_expr(t)) % FP_MOD,
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, "Scaling Language
    Models", App. A1.1): per-document word-n-gram repetition signals used to
    drop boilerplate/spammy pages from web-scale training corpora —

    - ``n_{n}grams``: total n-gram instances,
    - ``dup_{n}gram_frac``: fraction of instances whose gram occurs more
      than once in the document,
    - ``top_{n}gram`` / ``top_{n}gram_count``: the most frequent n-gram
      (ties broken by lexicographically smallest — deterministic),
    - ``top_{n}gram_char_frac``: fraction of the document's characters
      covered by occurrences of that top n-gram.

    Scale: one explode + one (id, gram) hash aggregation with map-side
    partial combine; the key space is balanced by construction (grams are
    scoped per doc), so no skew handling is needed. All JVM-side.
    """
    p = f"{n}gram"
    toks = _tokens(text_col)
    base = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("_n_chars"),
        toks.alias("_toks"),
    )
    grams_arr = F.when(
        F.size("_toks") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("_toks") - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at("_toks", i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        base.select(id_col, "_n_chars", F.explode(grams_arr).alias("_gram"))
        .groupBy(id_col, "_n_chars", "_gram")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    per_doc = counts.groupBy(id_col).agg(
        F.sum("_cnt").alias(f"n_{p}s"),
        F.round(
            F.sum(F.when(F.col("_cnt") > 1, F.col("_cnt")).otherwise(0))
            / F.sum("_cnt"), 6,
        ).alias(f"dup_{p}_frac"),
        F.min_by(
            F.struct(F.col("_gram"), F.col("_cnt")),
            F.struct((-F.col("_cnt")).alias("_nc"), F.col("_gram")),
        ).alias("_top"),
        F.first("_n_chars").alias("_n_chars"),
    )
    out = base.select(id_col).join(per_doc, id_col, "left")
    return out.select(
        F.col(id_col),
        F.coalesce(F.col(f"n_{p}s"), F.lit(0)).alias(f"n_{p}s"),
        F.coalesce(F.col(f"dup_{p}_frac"), F.lit(0.0)).alias(f"dup_{p}_frac"),
        F.col("_top._gram").alias(f"top_{p}"),
        F.coalesce(F.col("_top._cnt"), F.lit(0)).alias(f"top_{p}_count"),
        F.coalesce(
            F.round(
                F.col("_top._cnt") * F.length("_top._gram") / F.col("_n_chars"),
                6,
            ),
            F.lit(0.0),
        ).alias(f"top_{p}_char_frac"),
    )


def gopher_keep_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_stopword_ratio: float = 0.02,
    min_distinct_ratio: float = 0.35,
    max_dup_2gram_frac: float = 0.6,
) -> DataFrame:
    """The Gopher-style KEEP/DROP decision (Rae et al. 2021, App. A1.1),
    composed from the signal operators: length bounds, stopword-fraction
    floor (natural-language-ness), distinct-token floor (anti-boilerplate),
    and a duplicated-2gram ceiling (anti-spam). Emits the per-rule verdicts
    so a pipeline can audit WHY a document was dropped, plus the final
    ``keep`` — the exact shape a corpus-cleaning pass acts on.

    Scale: three doc_id-keyed hash joins of per-doc signal tables — all
    co-partitioned on the same key, no skew (doc_id is unique).
    """
    toks = _tokens(text_col)
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("_dist_ratio"),
        (F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / F.size(toks))
        .alias("_stop_ratio"),
    )
    rep = repetition_signals(df, id_col, text_col, n=2).select(
        id_col, "dup_2gram_frac")
    out = base.join(rep, id_col)
    keep_len = (F.col("n_tokens") >= min_tokens) & (
        F.col("n_tokens") <= max_tokens)
    keep_stop = F.col("_stop_ratio") >= min_stopword_ratio
    keep_dist = F.col("_dist_ratio") >= min_distinct_ratio
    keep_rep = F.col("dup_2gram_frac") <= max_dup_2gram_frac
    return out.select(
        F.col(id_col),
        F.col("n_tokens"),
        keep_len.alias("keep_length"),
        keep_stop.alias("keep_stopwords"),
        keep_dist.alias("keep_distinct"),
        keep_rep.alias("keep_repetition"),
        (keep_len & keep_stop & keep_dist & keep_rep).alias("keep"),
    )


def decontaminate(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    eval_mod: int = 97,
) -> DataFrame:
    """Benchmark decontamination — flag training documents that share any
    word n-gram with a held-out evaluation set (the published GPT-3
    appendix-C / PaLM / Llama train-test overlap method: 13-gram overlap
    there; ``n`` tokens here to fit short synthetic docs). The eval set is
    the deterministic ``doc_id % eval_mod == 0`` slice of the corpus — a
    self-contained stand-in for an external benchmark suite. Emits, per
    TRAINING doc: the number of its distinct n-grams that appear anywhere
    in the eval set and the resulting ``contaminated`` verdict — the rows a
    decontamination pass would drop before training.

    Scale: the eval n-gram set is tiny relative to the corpus (benchmark
    suites are MBs; the corpus is TBs), so it is broadcast and the corpus
    side is NEVER shuffled — one map-side broadcast semi-join over the
    exploded (doc, gram) stream, then a per-doc hash agg keyed by unique
    doc_id (no skew). Grams join as raw strings here for cross-engine
    oracle parity; at 100 TB the same plan runs on xxhash64(gram) to cut
    the exchange payload 10-50x (collision odds ~2^-64 per pair).
    """
    from .dedup_ops import doc_shingles

    is_eval = (F.col(id_col) % eval_mod) == 0
    eval_grams = (
        doc_shingles(df.filter(is_eval), id_col, text_col, n)
        .select("shingle").distinct()
    )
    train = df.filter(~is_eval)
    hits = (
        doc_shingles(train, id_col, text_col, n)
        .join(F.broadcast(eval_grams), "shingle")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_eval_grams_hit"))
    )
    return (
        train.select(F.col(id_col))
        .join(hits.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_eval_grams_hit", F.lit(0)).alias("n_eval_grams_hit"),
            (F.coalesce("n_eval_grams_hit", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# PII patterns: explicit character classes only (no \d/\s shorthand, no
# lookaround, no backrefs) so Java regex (Spark) and RE2 (DuckDB oracle)
# match byte-for-byte identically. Redaction is SEQUENTIAL — email, then
# ipv4, then phone — and each count is taken on the text as it stands at
# that step, so both engines see the same non-overlapping leftmost matches.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_IPV4 = (r"\b[0-9][0-9]?[0-9]?\.[0-9][0-9]?[0-9]?"
            r"\.[0-9][0-9]?[0-9]?\.[0-9][0-9]?[0-9]?\b")
PII_PHONE = r"\+?[0-9][0-9() \-]{7,}[0-9]"


def pii_scrub(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """PII redaction — the standard web-corpus cleaning step (C4 and
    RefinedWeb both strip contact strings before training): replace emails,
    IPv4 addresses, and phone-like digit runs with typed placeholder tokens
    and report per-kind match counts plus a ``has_pii`` verdict.

    Pure Column expressions (regexp_count / regexp_replace, JVM-side,
    whole-stage codegen — no Python in the hot path); embarrassingly
    parallel per row, no shuffle, scales linearly to 100 TB. Reference
    parity note: DataX's transformer pipeline exposes dx_replace/dx_filter
    (transformer/src/.../ReplaceTransformer.java) for exactly this kind of
    per-record scrub; this operator is that stage specialised to PII with
    auditable counts.
    """
    t0 = F.col(text_col)
    n_email = F.regexp_count(t0, F.lit(PII_EMAIL))
    t1 = F.regexp_replace(t0, PII_EMAIL, "<EMAIL>")
    n_ip = F.regexp_count(t1, F.lit(PII_IPV4))
    t2 = F.regexp_replace(t1, PII_IPV4, "<IP>")
    n_phone = F.regexp_count(t2, F.lit(PII_PHONE))
    t3 = F.regexp_replace(t2, PII_PHONE, "<PHONE>")
    return df.select(
        F.col(id_col),
        t3.alias("text_scrubbed"),
        n_email.cast("long").alias("n_emails"),
        n_ip.cast("long").alias("n_ipv4s"),
        n_phone.cast("long").alias("n_phones"),
        ((n_email + n_ip + n_phone) > 0).alias("has_pii"),
    )
