"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting.

All pure JVM expressions (lambda higher-order functions) — mirrorable in the
DuckDB oracle and free of Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import h64, ngrams_expr, shingles_expr, tokens_expr

# Tiny deterministic marker-word lists (top function words per language).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "is", "that", "it", "for", "with"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "de": ("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "nicht"),
    "fr": ("le", "la", "les", "des", "et", "est", "une", "dans", "que", "pour"),
}

STOP_MARKERS = LANG_MARKERS["en"]


def token_count_expr(col: Column) -> Column:
    return F.size(tokens_expr(col))


# BPE-ish pre-tokenization: letter runs / digit runs / single non-space
# symbols — the standard byte-pair-encoder pre-split shape (cf. the GPT-2
# pattern), restricted to constructs whose regex semantics are identical in
# Java (Spark) and RE2 (DuckDB) so the oracle mirrors it verbatim.
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpe_token_count_expr(col: Column) -> Column:
    """Approximate LLM-token count: count of BPE-style pre-tokens. A real
    BPE merge table only splits these pre-tokens further, so this is the
    standard cheap proxy used to size training-data budgets."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(BPE_PATTERN), F.lit(0)))


def snippet_expr(
    toks: Column, term: str, before: int = 3, after: int = 3
) -> tuple[Column, Column]:
    """(first_pos, snippet) for one query term over a token array.

    ``first_pos`` is the 1-based position of the term's FIRST occurrence
    (0 when absent); ``snippet`` is the space-joined token window
    ``[first_pos-before, first_pos+after]`` clipped to the document. Pure
    JVM array expressions (``array_position`` + ``slice`` + ``concat_ws``)
    — whole-stage codegen, no UDF, oracle-mirrorable in SQL
    (``list_position`` / ``list_slice`` / ``array_to_string``)."""
    pos = F.array_position(toks, term)
    start = F.greatest(pos - F.lit(before), F.lit(1))
    length = pos + F.lit(after) - start + F.lit(1)
    return pos, F.concat_ws(" ", F.slice(toks, start, length))


def keyword_snippets(
    df: DataFrame,
    term: str,
    text: str = "content",
    id_col: str = "docId",
    before: int = 3,
    after: int = 3,
) -> DataFrame:
    """Result-page snippet generation: for every doc containing ``term``
    (naive tokens), the token window around its first occurrence.

    The serving-path shape at scale: run AFTER retrieval on the (small)
    hydrated hit set — a scan + project over result rows, never the corpus.
    Exposed over the whole table here so the oracle can check every row."""
    toks = tokens_expr(F.col(text))
    pos, snip = snippet_expr(toks, term, before, after)
    return (
        df.select(F.col(id_col), pos.alias("first_pos"), snip.alias("snippet"))
        .where(F.col("first_pos") > 0)
    )


def highlight_exprs(
    toks: Column, terms: list[str], window: int = 8
) -> tuple[Column, Column, Column]:
    """(window_start, coverage, snippet) for a multi-term query over a token
    array — the Lucene Highlighter shape: pick the ``window``-token span
    covering the most DISTINCT query terms (earliest span on ties) and wrap
    every matched token in ``<em>`` tags.

    ``window_start`` is 1-based (0 coverage ⇒ start 0); candidate spans
    start at query-term hit positions only (a best-coverage span can always
    be slid left until it starts on a hit, so this loses nothing). Pure JVM
    higher-order functions (``transform``/``filter``/``exists``/
    ``aggregate``) — whole-stage codegen, zero shuffle, no UDF; oracle-
    mirrorable in SQL (per-hit coverage subquery + ``QUALIFY row_number``).
    """
    ts = sorted(set(terms))
    arr = F.array(*[F.lit(t) for t in ts])
    w = F.lit(window)
    # 0-based positions of any query-term token = candidate span starts.
    starts = F.filter(
        F.transform(
            toks,
            lambda t, i: F.when(F.array_contains(arr, t), i).otherwise(F.lit(-1)),
        ),
        lambda i: i >= F.lit(0),
    )
    # Per-term hit-position lists (python-side loop over the FIXED query
    # terms — the expression tree is len(terms) wide, the data never is).
    def _pos_list(term: str) -> Column:
        lit = F.lit(term)
        return F.filter(
            F.transform(
                toks, lambda tok, i: F.when(tok == lit, i).otherwise(F.lit(-1))
            ),
            lambda i: i >= F.lit(0),
        )

    pos_lists = [_pos_list(t) for t in ts]

    def cov(p: Column) -> Column:
        c = F.lit(0)
        for pl in pos_lists:
            c = c + F.when(
                F.exists(pl, lambda x: (x >= p) & (x < p + w)), F.lit(1)
            ).otherwise(F.lit(0))
        return c

    # Fold over ascending candidate starts keeping the strictly-best
    # coverage — ties keep the FIRST (earliest) span.
    zero = F.struct(F.lit(-1).alias("p"), F.lit(0).alias("c"))
    best = F.aggregate(
        starts,
        zero,
        lambda acc, p: F.when(
            cov(p) > acc["c"], F.struct(p.alias("p"), cov(p).alias("c"))
        ).otherwise(acc),
    )
    win = F.slice(toks, best["p"] + F.lit(1), w)
    wrapped = F.transform(
        win,
        lambda t: F.when(
            F.array_contains(arr, t), F.concat(F.lit("<em>"), t, F.lit("</em>"))
        ).otherwise(t),
    )
    return best["p"] + F.lit(1), best["c"], F.array_join(wrapped, " ")


def highlight_terms(
    df: DataFrame,
    terms: list[str],
    window: int = 8,
    text: str = "content",
    id_col: str = "docId",
) -> DataFrame:
    """Query-aware result highlighting: for every doc containing at least
    one query term (naive tokens), the best ``window``-token span by
    distinct-term coverage with matches ``<em>``-wrapped.

    The serving-path shape at scale: run AFTER retrieval on the (small)
    hydrated hit set — a pure projection over result rows, never a corpus
    shuffle. Exposed over a whole doc set here so the oracle can check
    every row."""
    toks = tokens_expr(F.col(text))
    start, c, snip = highlight_exprs(toks, terms, window)
    return (
        df.select(
            F.col(id_col),
            start.alias("window_start"),
            c.alias("coverage"),
            snip.alias("snippet"),
        )
        .where(F.col("coverage") >= 1)
    )


def lang_scores(toks: Column) -> dict[str, Column]:
    """Occurrence count of each language's marker words."""
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_id(df: DataFrame, text: str = "content", id_col: str = "docId") -> DataFrame:
    """N-gram/marker-word language heuristic: argmax of marker hit counts,
    deterministic tie order (en > es > de > fr), 'und' when no hits."""
    toks = tokens_expr(F.col(text))
    scores = lang_scores(toks)
    langs = list(LANG_MARKERS)
    best_lang, best_score = F.lit("und"), F.lit(0)
    for lang in reversed(langs):  # earlier languages win ties
        s = scores[lang]
        best_lang = F.when(s >= F.greatest(best_score, F.lit(1)), F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(best_score, s)
    sel = [F.col(id_col), best_lang.alias("lang_pred")] + [
        scores[lang].alias(f"hits_{lang}") for lang in langs
    ]
    return df.select(*sel)


def quality_score(df: DataFrame, text: str = "content", id_col: str = "docId") -> DataFrame:
    """Heuristic quality features + composite score:

    - n_chars, n_tokens, mean token length
    - stopword ratio (English function words — too low => non-prose)
    - distinct-token ratio (too low => boilerplate/repetition)
    - composite in [0,1]: penalizes extremes, rewards mid-range ratios.
    """
    toks = tokens_expr(F.col(text))
    arr = F.array(*[F.lit(m) for m in STOP_MARKERS])
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text))
    stop_ratio = F.when(
        n_tok > 0,
        F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    distinct_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(toks)).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    mean_len = F.when(n_tok > 0, (n_chars - (n_tok - 1)).cast("double") / n_tok).otherwise(
        F.lit(0.0)
    )
    score = (
        F.least(n_tok.cast("double") / 64.0, F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.2
        + F.least(distinct_ratio * 2.0, F.lit(1.0)) * 0.2
        + F.when((mean_len >= 3.0) & (mean_len <= 10.0), 0.2).otherwise(0.0)
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(score, 6).alias("quality"),
    )


def repetition_stats(
    df: DataFrame,
    text: str = "content",
    id_col: str = "docId",
    top_bigram_max: float = 0.18,
    dup_trigram_max: float = 0.30,
) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1,
    the standard "repetitious document" removal rules of an LLM training
    pipeline, adapted to single-line text):

    - ``top_bigram_frac`` — fraction of tokens covered by the single most
      frequent word bigram (Gopher's top-2-gram rule; > 0.18 ⇒ remove)
    - ``dup_trigram_frac`` — fraction of trigram occurrences that are
      repeats, ``1 − distinct/total`` (the duplicate-n-gram family)
    - ``repetitious`` — true when either signal crosses its threshold

    Scale shape: the trigram ratio is a pure per-row array expression
    (whole-stage codegen, zero shuffle). The bigram MODE cannot be a per-row
    array fold without O(len²) work, so it takes the linear distributed
    route: explode → partial+final count per (doc, bigram) → max per doc —
    two bounded aggregations, both map-side combinable, no windows. Docs
    with < 2 (resp. < 3) tokens score 0.0 by definition."""
    toks = tokens_expr(F.col(text))
    tg = ngrams_expr(toks, 3)
    base = df.select(
        F.col(id_col),
        toks.alias("_t"),
        F.when(
            F.size(tg) > 0,
            1.0 - F.size(F.array_distinct(tg)).cast("double") / F.size(tg),
        )
        .otherwise(0.0)
        .alias("_dup3"),
    )
    bg_top = (
        base.select(id_col, F.explode(ngrams_expr(F.col("_t"), 2)).alias("_bg"))
        .groupBy(id_col, "_bg")
        .agg(F.count("*").alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_top"))
    )
    out = base.join(bg_top, id_col, "left").select(
        F.col(id_col),
        F.size("_t").alias("n_tokens"),
        F.round(
            F.when(
                F.col("_top").isNotNull(),
                F.col("_top") * 2.0 / F.size("_t").cast("double"),
            ).otherwise(0.0),
            6,
        ).alias("top_bigram_frac"),
        F.round(F.col("_dup3"), 6).alias("dup_trigram_frac"),
    )
    return out.withColumn(
        "repetitious",
        (F.col("top_bigram_frac") > top_bigram_max)
        | (F.col("dup_trigram_frac") > dup_trigram_max),
    )


def fingerprint(
    df: DataFrame, text: str = "content", id_col: str = "docId", shingle_n: int = 3
) -> DataFrame:
    """Document fingerprint: min/max hash over word shingles (rolling-hash
    family; robust to small edits, oracle-mirrorable)."""
    sh = shingles_expr(tokens_expr(F.col(text)), shingle_n)
    hashes = F.transform(sh, lambda s: h64(s))
    return df.select(
        F.col(id_col),
        F.array_min(hashes).alias("fp_min"),
        F.array_max(hashes).alias("fp_max"),
        F.size(sh).alias("n_shingles"),
    )


# PII patterns restricted to constructs with identical semantics in Java
# (Spark) and RE2 (DuckDB): character classes, bounded repetition, inline
# (?i) case-insensitivity, no backrefs/lookaround. Email first — redacting
# it prevents the phone rule from matching digit runs inside an address
# local part.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+", "[EMAIL]"),
    ("phone", r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}", "[PHONE]"),
)


def pii_scrub(df: DataFrame, text: str = "content", id_col: str = "docId") -> DataFrame:
    """PII redaction for training-data pipelines: count and strip email
    addresses and phone numbers (the standard pre-training scrub; cf. the
    C4 / RefinedWeb cleaning stages).

    Returns ``(id, n_email, n_phone, scrubbed)`` where ``scrubbed`` is the
    ORIGINAL text (case preserved — training text must not be case-folded
    by a redaction pass) with each match replaced by its placeholder, in
    the fixed :data:`PII_PATTERNS` order; matching is case-insensitive via
    inline ``(?i)``. Each pattern's COUNT is taken on the text as it stands
    when that pattern runs (i.e. after earlier redactions), so counts always
    reconcile with the placeholders actually present in ``scrubbed`` — a
    phone-shaped digit run inside an email address is redacted as part of
    the email and NOT double-counted as a phone.

    Scale shape: pure per-row JVM regex expressions (``regexp_extract_all``
    for counts, chained ``regexp_replace`` for the rewrite) — whole-stage
    codegen, zero shuffle, zero Python; the oracle mirrors the same RE2-safe
    patterns verbatim."""
    stage = F.col(text)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(stage, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        )
        stage = F.regexp_replace(stage, pat, repl)
    return df.select(F.col(id_col), *counts, stage.alias("scrubbed"))
