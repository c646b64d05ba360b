"""Unified Lucene-style query-string parser + one-plan execution.

The engine's 90+ operators each have a programmatic surface; this module
closes the last UX gap between them and ONE query box (the Lucene
``QueryParser`` / Elasticsearch ``query_string`` shape, over the
reference's query surfaces IIM:697-903):

    spark AND "table scan"~1 AND name:foo~1 AND n_chars:[100 TO 400]
      AND pre* AND NOT merge

Grammar (explicit operators, like :func:`..query.parse_bool` — bare
adjacency is rejected rather than silently OR'd):

- ``AND`` / ``OR`` / ``NOT`` with parentheses; precedence NOT > AND > OR
- ``term`` — analyzed; multi-token analysis becomes the AND of its tokens
- ``"a b c"`` — exact phrase (positions); ``"a b"~N`` — ordered sloppy
  phrase with slop N
- ``term~`` / ``term~N`` — fuzzy (edit distance ≤ N, default 1),
  dictionary-expanded like Lucene FuzzyQuery
- ``pre*`` — prefix (term-dictionary range seek)
- ``field:term`` — fielded term over a ``build_index(fields={...})`` index
- ``col:[lo TO hi]`` — inclusive numeric range over a corpus metadata
  column (requires ``corpus``)

Execution (:func:`search_parsed`) compiles the WHOLE tree to one plan in
the :func:`..query.search_bool` shape, generalized to heterogeneous
leaves: every leaf contributes tagged ``(docId, leaf_id)`` rows —

- term / fielded / fuzzy-expansion leaves share ONE ``In``-pushed posting
  decode with a broadcast (term → leaf) fanout;
- phrase leaves share ONE positional decode (their own terms only);
- prefix leaves are ``StringStartsWith``-pushed segment seeks;
- range leaves are corpus column filters (parquet min/max pruning);

— then one ``collect_set(leaf_id)`` agg per docId and the tree folds into
a single codegen boolean over ``array_contains``. Leaf count is
query-bounded, so the whole query costs a couple of pushed scans + one
shuffle regardless of nesting. Purely negative trees are rejected (they
match "documents containing none of the terms" — a corpus scan, not an
index query)."""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .query import analyze_query, field_terms

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<quoted>"[^"]*"(?:~\d+)?)   # "phrase" or "phrase"~N
      | (?P<range>\[[^\]]*\])          # [lo TO hi]
      | (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<colon>:)
      | (?P<word>[^\s():\[\]"]+)       # bare term incl. ~N / * suffixes
    )""",
    re.VERBOSE,
)


def _scan(query: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(query):
        m = _TOKEN.match(query, pos)
        if not m or m.end() == pos:
            if query[pos:].strip():
                raise ValueError(f"cannot tokenize {query[pos:]!r}")
            break
        pos = m.end()
        for kind in ("quoted", "range", "lparen", "rparen", "colon", "word"):
            v = m.group(kind)
            if v is not None:
                toks.append((kind, v))
                break
    return toks


def _leaf_from_word(word: str, analyzer: str, field: str | None):
    """One bare word (possibly with ~N / * suffix) -> leaf node(s)."""
    m = re.fullmatch(r"(.+?)~(\d*)", word)
    if m:
        base, d = m.group(1), m.group(2)
        toks = analyze_query([base], analyzer)
        if len(toks) != 1:
            raise ValueError(f"fuzzy term {word!r} must analyze to one token")
        if field is not None:
            raise ValueError("fuzzy is not supported on fielded terms")
        return ("fuzzy", toks[0], int(d) if d else 1)
    if word.endswith("*") and len(word) > 1:
        if field is not None:
            raise ValueError("prefix is not supported on fielded terms")
        return ("prefix", word[:-1])
    if field is not None:
        toks = field_terms(field, [word], analyzer)
        if not toks:
            raise ValueError(f"{field}:{word} analyzes to nothing")
        if len(toks) == 1:
            return ("term", toks[0])
        return ("and", [("term", t) for t in toks])
    toks = analyze_query([word], analyzer)
    if not toks:
        raise ValueError(f"term {word!r} analyzes to nothing ({analyzer})")
    if len(toks) == 1:
        return ("term", toks[0])
    return ("and", [("term", t) for t in toks])


def parse_query(query: str, analyzer: str = "naive"):
    """Parse a Lucene-style query string into a tree for
    :func:`search_parsed` (term leaves are compatible with
    :func:`..query.search_bool` trees)."""
    toks = _scan(query)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else (None, None)

    def take():
        nonlocal pos
        if pos >= len(toks):
            raise ValueError(f"unexpected end of query: {query!r}")
        t = toks[pos]
        pos += 1
        return t

    def atom():
        kind, v = peek()
        if kind == "lparen":
            take()
            node = or_expr()
            k2, _ = take()
            if k2 != "rparen":
                raise ValueError(f"missing ')' in {query!r}")
            return node
        if kind == "quoted":
            take()
            m = re.fullmatch(r'"([^"]*)"(?:~(\d+))?', v)
            body, slop = m.group(1), int(m.group(2) or 0)
            terms = analyze_query(body.split(), analyzer)
            if not terms:
                raise ValueError(f"phrase {v!r} analyzes to nothing")
            if len(terms) == 1 and slop == 0:
                return ("term", terms[0])
            return ("phrase", tuple(terms), slop)
        if kind != "word":
            raise ValueError(f"expected a term, got {v!r} in {query!r}")
        take()
        word = v
        k2, v2 = peek()
        if k2 == "colon":  # field:value | col:[lo TO hi]
            take()
            k3, v3 = take()
            if k3 == "range":
                m = re.fullmatch(r"\[\s*(\S+)\s+TO\s+(\S+)\s*\]", v3)
                if not m:
                    raise ValueError(f"malformed range {v3!r} (use [lo TO hi])")
                return ("range", word, float(m.group(1)), float(m.group(2)))
            if k3 == "quoted":
                raise ValueError("fielded phrases are not supported; index "
                                 "the field positionally and query unfielded")
            if k3 != "word":
                raise ValueError(f"expected a value after {word}:")
            return _leaf_from_word(v3, analyzer, word)
        if word in ("AND", "OR", "NOT"):
            raise ValueError(f"operator {word!r} needs an operand in {query!r}")
        return _leaf_from_word(word, analyzer, None)

    def unary():
        kind, v = peek()
        if kind == "word" and v == "NOT":
            take()
            return ("not", unary())
        return atom()

    def and_expr():
        children = [unary()]
        while peek() == ("word", "AND"):
            take()
            children.append(unary())
        k, v = peek()
        if k is not None and not (k == "rparen" or (k == "word" and v == "OR")):
            raise ValueError(
                f"bare adjacency near {v!r} — join terms with AND/OR "
                f"explicitly in {query!r}"
            )
        return children[0] if len(children) == 1 else ("and", children)

    def or_expr():
        children = [and_expr()]
        while peek() == ("word", "OR"):
            take()
            children.append(and_expr())
        return children[0] if len(children) == 1 else ("or", children)

    tree = or_expr()
    if pos != len(toks):
        raise ValueError(f"trailing input {toks[pos:]!r} in {query!r}")
    return tree


# --- execution -------------------------------------------------------------


def _collect_leaves(tree, out: list):
    kind = tree[0]
    if kind in ("and", "or"):
        for c in tree[1]:
            _collect_leaves(c, out)
    elif kind == "not":
        _collect_leaves(tree[1], out)
    else:
        if tree not in out:
            out.append(tree)


def _eval_py(tree, present: set) -> bool:
    kind = tree[0]
    if kind == "and":
        return all(_eval_py(c, present) for c in tree[1])
    if kind == "or":
        return any(_eval_py(c, present) for c in tree[1])
    if kind == "not":
        return not _eval_py(tree[1], present)
    return tree in present


def _eval_col(tree, ids: dict, col: Column) -> Column:
    kind = tree[0]
    if kind == "and":
        out = None
        for c in tree[1]:
            e = _eval_col(c, ids, col)
            out = e if out is None else (out & e)
        return out
    if kind == "or":
        out = None
        for c in tree[1]:
            e = _eval_col(c, ids, col)
            out = e if out is None else (out | e)
        return out
    if kind == "not":
        return ~_eval_col(tree[1], ids, col)
    return F.array_contains(col, F.lit(ids[tree]))


def search_parsed(
    spark: SparkSession,
    segments: DataFrame,
    term_stats: DataFrame,
    tree,
    corpus: DataFrame | None = None,
    analyzer: str = "naive",
    max_expansions: int = 64,
) -> DataFrame:
    """Execute a :func:`parse_query` tree -> docId DataFrame (see module
    docstring for the one-plan shape)."""
    from ..sources.segments import decode_postings
    from .query import search_phrase, search_prefix, search_sloppy_phrase
    from .query import fuzzy_candidates

    leaves: list = []
    _collect_leaves(tree, leaves)
    if not leaves:
        return spark.createDataFrame([], "docId long")
    if _eval_py(tree, set()):
        raise ValueError(
            "purely negative query (matches docs containing none of its "
            "terms) — add at least one positive clause"
        )
    ids = {leaf: i for i, leaf in enumerate(leaves)}
    tagged: list[DataFrame] = []

    # term-membership leaves share ONE decode + a broadcast fanout
    term_leaf: list[tuple[str, int]] = []  # (term, leaf_id)
    for leaf in leaves:
        if leaf[0] == "term":
            term_leaf.append((leaf[1], ids[leaf]))
        elif leaf[0] == "fuzzy":
            cands = [r.term for r in fuzzy_candidates(
                term_stats, leaf[1], leaf[2], max_expansions).collect()]
            term_leaf += [(t, ids[leaf]) for t in cands]
    if term_leaf:
        all_terms = sorted({t for t, _ in term_leaf})
        fanout = spark.createDataFrame(term_leaf, "term string, leaf int")
        dec = decode_postings(segments, all_terms).select("term", "docId")
        tagged.append(
            dec.join(F.broadcast(fanout), "term")
            .select("docId", "leaf").distinct()
        )

    phrase_leaves = [l for l in leaves if l[0] == "phrase"]
    if phrase_leaves:
        pterms = sorted({t for l in phrase_leaves for t in l[1]})
        pos = decode_postings(segments, pterms, with_positions=True)
        for leaf in phrase_leaves:
            hits = (search_phrase(pos, list(leaf[1])) if leaf[2] == 0
                    else search_sloppy_phrase(pos, list(leaf[1]), leaf[2]))
            tagged.append(hits.select("docId", F.lit(ids[leaf]).alias("leaf")))

    for leaf in leaves:
        if leaf[0] == "prefix":
            hits = search_prefix(segments, leaf[1], analyzer)
            tagged.append(hits.select("docId", F.lit(ids[leaf]).alias("leaf")))
        elif leaf[0] == "range":
            if corpus is None:
                raise ValueError(
                    f"range leaf on column {leaf[1]!r} needs corpus=")
            if leaf[1] not in corpus.columns:
                raise ValueError(f"unknown range column {leaf[1]!r}")
            col = F.col(leaf[1])
            hits = corpus.where(
                (col >= F.lit(leaf[2])) & (col <= F.lit(leaf[3]))
            )
            tagged.append(hits.select("docId", F.lit(ids[leaf]).alias("leaf")))

    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    matched = out.groupBy("docId").agg(F.collect_set("leaf").alias("_ls"))
    return matched.where(_eval_col(tree, ids, F.col("_ls"))).select("docId")


def search_query_string(
    spark: SparkSession,
    segments: DataFrame,
    term_stats: DataFrame,
    query: str,
    corpus: DataFrame | None = None,
    analyzer: str = "naive",
    max_expansions: int = 64,
) -> DataFrame:
    """One-call convenience: parse + execute a query string."""
    return search_parsed(
        spark, segments, term_stats, parse_query(query, analyzer),
        corpus=corpus, analyzer=analyzer, max_expansions=max_expansions,
    )
