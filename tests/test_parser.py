"""Unified Lucene-style query parser: grammar goldens + end-to-end
execution equality against the composed single-operator truths."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import query as Q
from search_engine_spark.operators.parser import (
    parse_query,
    search_parsed,
    search_query_string,
)
from search_engine_spark.sources import segments as S
from tests.conftest import corpus_from_texts

DOCS = [
    "spark scan table scan filter join",    # 0
    "table a b c d e scan",                 # 1
    "scan table",                           # 2
    "join filter spark spark",              # 3
    "table x scan y table z z scan",        # 4
    "apple rotten apple",                   # 5
    "def import tok1 tok2",                 # 6
    "import tok1 prefab",                   # 7
    "sparky table",                         # 8  (fuzzy target for spark~1)
]


def test_parse_query_goldens():
    p = lambda s: parse_query(s, "naive")
    assert p("spark") == ("term", "spark")
    assert p("spark AND join") == ("and", [("term", "spark"), ("term", "join")])
    assert p("a OR b AND c") == (
        "or", [("term", "a"), ("and", [("term", "b"), ("term", "c")])])
    assert p("NOT a AND b") == ("and", [("not", ("term", "a")), ("term", "b")])
    assert p('"table scan"') == ("phrase", ("table", "scan"), 0)
    assert p('"table scan"~2') == ("phrase", ("table", "scan"), 2)
    assert p("spark~") == ("fuzzy", "spark", 1)
    assert p("spark~2") == ("fuzzy", "spark", 2)
    assert p("pre*") == ("prefix", "pre")
    assert p("n_chars:[10 TO 99]") == ("range", "n_chars", 10.0, 99.0)
    assert p("(a OR b) AND NOT c") == (
        "and", [("or", [("term", "a"), ("term", "b")]),
                ("not", ("term", "c"))])
    with pytest.raises(ValueError, match="bare adjacency"):
        p("spark join")
    with pytest.raises(ValueError, match="trailing|adjacency|operand"):
        p("AND spark")
    with pytest.raises(ValueError, match="malformed range"):
        p("x:[1 2]")


def test_parse_fielded():
    tree = parse_query("lang:en", "naive")
    assert tree[0] == "term" and tree[1].endswith("en")
    with pytest.raises(ValueError, match="fuzzy.*fielded"):
        parse_query("lang:en~1", "naive")


@pytest.fixture(scope="module")
def parsed_index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("parser")
    idx = str(root / "idx")
    corpus = corpus_from_texts(spark, DOCS).withColumn(
        "n_chars", F.length("content"))
    S.build_index(spark, corpus, idx, analyzer="naive", n_batches=2,
                  with_positions=True)
    return (corpus, S.load_segments(spark, idx),
            S.load_term_stats(spark, idx))


def _ids(df):
    return sorted(r.docId for r in df.collect())


def test_search_parsed_equals_composition(spark, parsed_index):
    corpus, segs, ts = parsed_index
    dec = S.decode_postings(segs)
    run = lambda q: _ids(search_query_string(
        spark, segs, ts, q, corpus=corpus, analyzer="naive"))

    # boolean core matches search_bool
    got = run("spark AND (scan OR filter) AND NOT apple")
    want = _ids(Q.search_bool(
        dec, Q.parse_bool("spark AND (scan OR filter) AND NOT apple", "naive")))
    assert got == want and got

    # phrase leaf matches search_phrase
    pos = S.decode_postings(segs, ["table", "scan"], with_positions=True)
    assert run('"table scan"') == _ids(Q.search_phrase(pos, ["table", "scan"]))
    # sloppy phrase leaf
    assert run('"table scan"~2') == _ids(
        Q.search_sloppy_phrase(pos, ["table", "scan"], 2))

    # fuzzy leaf matches search_fuzzy (spark~1 also hits 'sparky')
    got_f = run("spark~1")
    want_f = _ids(Q.search_fuzzy(dec, ts, "spark", 1))
    assert got_f == want_f and 8 in got_f

    # prefix leaf matches search_prefix
    assert run("pre*") == _ids(Q.search_prefix(segs, "pre", "naive"))

    # range leaf over a corpus column
    lens = {r.docId: len(DOCS[r.docId]) for r in corpus.collect()}
    lo, hi = 10, 20
    assert run(f"n_chars:[{lo} TO {hi}] AND table") == sorted(
        d for d, n in lens.items()
        if lo <= n <= hi and "table" in DOCS[d].split())

    # the compound query composes all leaf kinds in one plan
    got_c = run('(spark~1 OR "table scan") AND n_chars:[10 TO 99] '
                "AND NOT apple")
    fz = set(want_f)
    ph = set(_ids(Q.search_phrase(pos, ["table", "scan"])))
    want_c = sorted(
        d for d in range(len(DOCS))
        if (d in fz or d in ph) and 10 <= lens[d] <= 99
        and "apple" not in DOCS[d].split())
    assert got_c == want_c and got_c

    # purely negative trees refuse
    with pytest.raises(ValueError, match="purely negative"):
        search_query_string(spark, segs, ts, "NOT spark", analyzer="naive")
    # range without corpus refuses
    with pytest.raises(ValueError, match="needs corpus"):
        search_query_string(spark, segs, ts, "n_chars:[1 TO 2]",
                            analyzer="naive")
