"""Analyzer goldens lifted from the reference test suite (SURVEY.md §5).

Sources: test/analysis/punctuation/*, test/analysis/stemmer/* in
/root/reference (expectations reproduced as data, no code copied).
"""

import pytest

from search_engine_spark.functions.analyzers import (
    WordBreakTokenizer,
    code_tokenize,
    naive_tokenize,
    porter_analyze,
    punctuation_tokenize,
    term_positions,
)
from search_engine_spark.functions.porter import porter_stem
from search_engine_spark.functions.stopwords import STOP_WORDS


def test_stopwords_frozen():
    # StopWords.java:13-143 — exactly 127 entries
    assert len(STOP_WORDS) == 127
    assert {"i", "the", "now", "don", "s", "t"} <= STOP_WORDS
    assert "dog" not in STOP_WORDS


PUNCT_CASES = [
    # PunctuationTokenizer.java:8 doc example
    ("I am Happy Today!", ["happy", "today"]),
    # Team2PunctuationTokenizerTest
    (
        "UCI: \n \n a public research university located in Irvine, \t \t California!",
        ["uci:", "public", "research", "university", "located", "irvine", "california"],
    ),
    (
        "UCI : \na, public research university located in Irvine,California!!!!",
        ["uci", ":", "public", "research", "university", "located", "irvine", "california"],
    ),
    ("\U0001F434 is a very cute horse head!", ["\U0001F434", "cute", "horse", "head"]),
    # Team4PunctuationTokenizerTest
    ("", []),
    ("......I am not happy today!? , ) ;", ["happy", "today", ")"]),
    ("   I     am    Happy Today!        ", ["happy", "today"]),
]


@pytest.mark.parametrize("text,expected", PUNCT_CASES)
def test_punctuation_tokenizer(text, expected):
    assert punctuation_tokenize(text) == expected


STEM_SENTENCES = [
    # Team18/19/20/21/22/23 + PorterStemmerTest goldens (stem each ws-token)
    ("stemming is an important concept in computer science",
     "stem is an import concept in comput scienc"),
    ("clothes satisfactory wearing worn wore", "cloth satisfactori wear worn wore"),
    ("Intellij IDEA is so popular among programmers that my friends Tom and Jerry both use it often.",
     "Intellij IDEA is so popular among programm that my friend Tom and Jerri both us it often."),
    ("how ever however", "how ever howev"),
    ("I am writing to test the Stemmer. Turning in the final results of the applications is due this week",
     "I am write to test the Stemmer. Turn in the final result of the applic is due thi week"),
    ("information retrieval is the activity of obtaining information system resources relevant to an information need from a collection",
     "inform retriev is the activ of obtain inform system resourc relev to an inform need from a collect"),
    ("He is an old man who fished alone in a skiff in the Gulf Stream and he had gone twenty-two weeks without taking a fish",
     "He is an old man who fish alon in a skiff in the Gulf Stream and he had gone twenty-two week without take a fish"),
    ("rate roll sky feed bled sing caress 1234", "rate roll sky feed bled sing caress 1234"),
    ("caresses ponies cats", "caress poni cat"),
    ("ties dogs caress need agreed disabled fitting making missing meeting meetings",
     "ti dog caress need agre disabl fit make miss meet meet"),
    ("organization organizer international responsibility fitness",
     "organ organ intern respons fit"),
    ("department humorousness dependence helpfulness analytical despotism",
     "depart humor depend help analyt despot"),
    ("agreed feed plastered bled motoring sing", "agre feed plaster bled motor sing"),
    ("conflated troubled sized hopping fizzed failing filing",
     "conflat troubl size hop fizz fail file"),
    ("happy sky", "happi sky"),
    ("triplicate formative formalize electriciti electrical hopeful goodness",
     "triplic form formal electr electr hope good"),
    ("relational conditional rational valenci hesitanci digitizer conformabli radicalli differentli vileli analogousli vietnamization predication operator feudalism decisiveness hopefulness callousness formaliti sensitiviti sensibiliti",
     "relat condit ration valenc hesit digit conform radic differ vile analog vietnam predic oper feudal decis hope callous formal sensit sensibl"),
    ("hopefully the refrigerator start working again in that chen li made some adjustment with carefulness",
     "hopefulli the refriger start work again in that chen li made some adjust with care"),
    ("the allowance of collaboration between media and tech company help activate the revival of journalism",
     "the allow of collabor between media and tech compani help activ the reviv of journal"),
    ("this wall is regarded as of the indestructible construction in ancient time which was built with marble in standardized size and designed by smartest scientist at that time",
     "thi wall is regard as of the indestruct construct in ancient time which wa built with marbl in standard size and design by smartest scientist at that time"),
    ("Indeed, my only wonder was that he had not already been mixed up in this extraordinary case, which was the one topic of conversation through the length and breadth of England.",
     "Indeed, my onli wonder wa that he had not alreadi been mix up in thi extraordinari case, which wa the on topic of convers through the length and breadth of England."),
]


@pytest.mark.parametrize("text,expected", STEM_SENTENCES)
def test_porter_goldens(text, expected):
    assert " ".join(porter_stem(t) for t in text.split()) == expected


def test_naive_tokenizer():
    assert naive_tokenize("The Quick  brown\tFox") == ["the", "quick", "brown", "fox"]


def test_code_tokenizer():
    assert code_tokenize("def foo(bar): return bar.x + 1") == [
        "def", "foo", "bar", "return", "bar", "x", "1",
    ]


def test_composable_analyzer():
    # ComposableAnalyzer.java:13-23 — tokenize then stem
    assert porter_analyze("An apple a day keeps a doctor away") == [
        "appl", "dai", "keep", "doctor", "awai",
    ]


def test_term_positions():
    # IIM:169-180 — positions are token indices in the analyzed list
    assert term_positions(["a", "b", "a"]) == {"a": [0, 2], "b": [1]}


def test_wordbreak():
    # WordBreakTokenizer.java:67-120 semantics on a fixture dictionary
    wb = WordBreakTokenizer({"it": 100, "is": 80, "a": 200, "cat": 10, "ca": 1, "tis": 1})
    assert wb.tokenize("itisacat") == ["cat"]  # it/is/a are stop words
    with pytest.raises(ValueError):
        wb.tokenize("zzz")
    assert wb.tokenize("") == []


def load_real_en_dict() -> dict[str, float]:
    """The committed REAL English word-frequency dictionary
    (tests/fixtures/wordbreak_dict_real_en.txt, 82,765 entries): the public
    Google Web Trillion Word Corpus unigram counts (the head of Peter
    Norvig's count_1w.txt, norvig.com/ngrams) — the exact resource the
    reference bundles and loads (``WordBreakTokenizer.java:44-64``,
    ``cs221_frequency_dictionary_en.txt``). Carried as behavioral contract
    data (BOM stripped), the same fixture policy as the A4/A8 stop lists —
    DP segmentation quality is asserted on real English distributions, not
    just reference-like dictionary sizes."""
    import os

    p = os.path.join(os.path.dirname(__file__), "fixtures",
                     "wordbreak_dict_real_en.txt")
    freq = {}
    with open(p) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                freq[parts[0]] = float(parts[1])
    return freq


def test_wordbreak_reference_dictionary():
    """WordBreakTokenizerTest.java:13-35 goldens on the REAL dictionary."""
    freq = load_real_en_dict()
    assert len(freq) == 82765
    wb = WordBreakTokenizer(freq)
    # WordBreakTokenizerTest goldens
    assert wb.tokenize("catdog") == ["cat", "dog"]
    text = "tosherlockholmessheisalwaysthewomanihaveseldomheardhimmentionherunderanyothernameinhiseyessheeclipsesandpredominatesthewholeofhersexitwasnotthathefeltanyemotionakintoloveforireneadlerallemotionsandthatoneparticularlywereabhorrenttohiscoldprecisebutadmirablybalancedmindhewasitakeitthemostperfectreasoningandobservingmachinethattheworldhasseenbutasaloverhewouldhaveplacedhimselfinafalsepositionheneverspokeofthesofterpassionssavewithagibeandasneertheywereadmirablethingsfortheobserverexcellentfordrawingtheveilfrommenmotivesandactionsbutforthetrainedreasonertoadmitsuchintrusionsintohisowndelicateandfinelyadjustedtemperamentwastointroduceadistractingfactorwhichmightthrowadoubtuponallhismentalresultsgritinasensitiveinstrumentoracrackinoneofhisownhighpowerlenseswouldnotbemoredisturbingthanastrongemotioninanaturesuchashisandyettherewasbutonewomantohimandthatwomanwasthelateireneadlerofdubiousandquestionablememory"
    expected = (
        "sherlock holmes always woman seldom heard mention name eyes eclipses "
        "predominates whole sex felt emotion akin love irene adler emotions one "
        "particularly abhorrent cold precise admirably balanced mind take perfect "
        "reasoning observing machine world seen lover would placed false position "
        "never spoke softer passions save gibe sneer admirable things observer "
        "excellent drawing veil men motives actions trained reasoner admit "
        "intrusions delicate finely adjusted temperament introduce distracting "
        "factor might throw doubt upon mental results grit sensitive instrument "
        "crack one high power lenses would disturbing strong emotion nature yet "
        "one woman woman late irene adler dubious questionable memory"
    ).split()
    assert wb.tokenize(text) == expected


def test_wordbreak_real_dict_long2_and_latency():
    """WordBreakTokenizerTest.java:38-50 (longTest2) golden + the 20 s
    latency envelope, both on the real 82,765-entry English dictionary."""
    import time

    wb = WordBreakTokenizer(load_real_en_dict())
    text = (
        "ihadseenlittleofholmeslatelymymarriagehaddriftedusawayfromeachother"
        "myowncompletehappinessandthehomecentredinterestswhichriseuparound"
        "themanwhofirstfindshimselfmasterofhisownestablishmentweresufficient"
        "toabsorballmyattentionwhileholmeswholoathedeveryformofsocietywith"
        "hiswholesoulremainedinourlodgingsinbakerstreetburiedamonghisold"
        "booksandalternatingfromweektoweekbetweencocaineandambitionthe"
        "drowsinessofthedrugandthefierceenergyofhisownkeennaturehewasstill"
        "aseverdeeplyattractedbythestudyofcrimeandoccupiedhisimmense"
        "facultiesandextraordinarypowersofobservationinfollowingoutthose"
        "cluesandclearingupthosemysterieswhichhadbeenabandonedashopelessby"
        "theofficialpolicefromtimetotimeiheardsomevagueaccountofhisdoings"
        "ofhissummonstoodessainthecaseofthemurderofhisclearingupofthe"
        "singulartragedyoftheatkinsonbrothersattrincomaleeandfinallyofthe"
        "missionwhichhehadaccomplishedsodelicatelyandsuccessfullyforthe"
        "reigningfamilyofhollandbeyondthesesignsofhisactivityhoweverwhichi"
        "merelysharedwithallthereadersofthedailypressiknewlittleofmyformer"
        "friendandcompanion"
    )
    expected = (
        "seen little holmes lately marriage drifted us away complete "
        "happiness home centred interests rise around man first finds master "
        "establishment sufficient absorb attention holmes loathed every form "
        "society whole soul remained lodgings baker street buried among old "
        "books alternating week week cocaine ambition drowsiness drug fierce "
        "energy keen nature still ever deeply attracted study crime occupied "
        "immense faculties extraordinary powers observation following clues "
        "clearing mysteries abandoned hopeless official police time time "
        "heard vague account doings summons odessa case murder clearing "
        "singular tragedy atkinson brothers trincomalee finally mission "
        "accomplished delicately successfully reigning family holland beyond "
        "signs activity however merely shared readers daily press knew "
        "little former friend companion"
    ).split()
    t0 = time.time()
    got = wb.tokenize(text)
    dt = time.time() - t0
    assert got == expected
    assert dt < 20.0, f"{dt:.2f}s breaks the reference's 20s envelope"


def test_wordbreak_cjk_dictionary():
    """A8 JapaneseTokenizer analog: same DP word-break over a CJK frequency
    dictionary (JapaneseTokenizer.java:19-84 — algorithm only, no data
    copied). No whitespace in the input; stop-word removal n/a."""
    from search_engine_spark.functions.analyzers import WordBreakTokenizer

    dic = {"こんにちは": 50, "世界": 30, "こん": 5, "にちは": 1, "せ": 1}
    tok = WordBreakTokenizer(dic)
    assert tok.tokenize("こんにちは世界") == ["こんにちは", "世界"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        tok.tokenize("さようなら")


def load_82k_dict() -> dict[str, float]:
    """The committed reference-scale dictionary fixture (82k entries,
    tools/gen_wordbreak_dict.py — same SCALE as the resource
    WordBreakTokenizer.java:44-64 loads, synthesized, no data copied)."""
    import os

    p = os.path.join(os.path.dirname(__file__), "fixtures",
                     "wordbreak_dict_82k.txt")
    freq = {}
    with open(p) as f:
        for line in f:
            w, fr = line.split()
            freq[w] = float(fr)
    return freq


def test_wordbreak_latency_envelope_at_82k():
    """WordBreakTokenizerTest.java:24-26 envelope: ~900-char string under
    20 s ON A DICTIONARY OF THE REFERENCE'S SCALE (committed 82k fixture —
    dictionary-scale behavior measured, not extrapolated from a 5k dict).
    The DP is O(n·max_word_len) with a dict-filtered inner loop; measured
    ~2.4 ms/900 chars here, dict init ~36 ms, dict RSS ~15 MB (BENCH.md)."""
    import time

    freq = load_82k_dict()
    assert len(freq) == 82000
    t0 = time.time()
    wb = WordBreakTokenizer(freq)
    text = ""
    for w in list(freq)[1000:1400]:
        if len(text) + len(w) > 900:
            break
        text += w
    toks = wb.tokenize(text)
    dt = time.time() - t0
    assert toks and "".join(toks) # non-trivial segmentation
    assert dt < 20.0, dt
    # unbreakable input still raises at this scale (reference contract)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        wb.tokenize("qqqqxxxxqqqq")


def test_wordbreak_spark_udf_and_analyzer(spark):
    """A7 wired as a Spark operator two ways: fixed-dict pandas UDF
    (make_wordbreak_udf) and the 'wordbreak' self-dictionary analyzer
    running through the posting builder — both must equal the single-node
    class on every row."""
    from pyspark.sql import functions as F

    from search_engine_spark.functions.analyzers import (
        make_wordbreak_udf,
        wordbreak_selfdict,
    )
    from search_engine_spark.operators.build import build_postings
    from tests.conftest import corpus_from_texts

    dic = {"spark": 100, "shuffle": 40, "join": 60, "scan": 30, "a": 500}
    texts = ["sparkjoinscan", "shufflejoin", "sparksparkshuffle"]
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    udf = make_wordbreak_udf(dic)
    got = [r.t for r in df.select(udf(F.col("s")).alias("t")).collect()]
    from search_engine_spark.functions.analyzers import WordBreakTokenizer

    wb = WordBreakTokenizer(dic)
    assert got == [wb.tokenize(t) for t in texts]

    corpus = corpus_from_texts(spark, ["spark join spark scan", "shuffle join a b"])
    rows = build_postings(corpus, "wordbreak").collect()
    posting = {(r.term, r.docId): r.tf for r in rows}
    exp0 = wordbreak_selfdict("spark join spark scan")
    assert posting[("spark", 0)] == exp0.count("spark") == 2
    assert posting[("join", 0)] == 1
    # doc 1: self-dict makes "b" breakable too (its own vocab)
    assert ("shuffle", 1) in posting and ("b", 1) in posting


def test_japanese_tokenizer_spark_udf(spark):
    """A8 on Spark: the fixed-dictionary word-break UDF over a CJK dict
    (JapaneseTokenizer.java:19-84 shape — algorithm only, no data copied)."""
    from pyspark.sql import functions as F

    from search_engine_spark.functions.analyzers import make_wordbreak_udf

    dic = {"こんにちは": 50, "世界": 30, "こん": 5, "にちは": 1}
    udf = make_wordbreak_udf(dic)
    df = spark.createDataFrame([("こんにちは世界",), ("世界こんにちは",)], "s string")
    got = [r[0] for r in df.select(udf(F.col("s"))).collect()]
    assert got == [["こんにちは", "世界"], ["世界", "こんにちは"]]


def test_japanese_tokenizer_reference_semantics():
    """A8 first-class tokenizer (JapaneseTokenizer.java:19-84 +
    JapaneseStopWords.java): DP segmentation over the committed fixture
    dict, punctuation raise, stop-word removal AFTER segmentation."""
    from search_engine_spark.functions.analyzers import JapaneseTokenizer
    from search_engine_spark.functions.cjk import (
        CJK_FREQ_DICT,
        JAPANESE_STOP_WORDS,
    )

    assert len(JAPANESE_STOP_WORDS) == 45  # JapaneseStopWords.java:17-63
    tok = JapaneseTokenizer()
    # particles は/が/です segment out and are then removed as stop words
    assert tok.tokenize("私は猫が好きです") == ["私", "猫", "好き"]
    assert tok.tokenize("") == []
    # multi-char dict word beats splitting into its substrings
    # (log p(日本) > log p(日) + log p(本))
    assert tok.tokenize("日本") == ["日本"]
    assert tok.tokenize("学生は学校で先生と話す") == ["学生", "学校", "先生", "話す"]
    # all-stop-word text -> []
    assert tok.tokenize("はがを") == []
    # ASCII punctuation raises (JapaneseTokenizer.java:40-44)
    with pytest.raises(ValueError):
        tok.tokenize("私は,猫")
    # unsegmentable text raises (:74-76)
    with pytest.raises(ValueError):
        tok.tokenize("私はXYZ")
    # pluggable dictionary, same semantics
    small = JapaneseTokenizer({"こんにちは": 50, "世界": 30, "は": 90})
    assert small.tokenize("こんにちは世界") == ["こんにちは", "世界"]
    assert all(f > 0 for f in CJK_FREQ_DICT.values())


def test_japanese_analyzer_registered(spark):
    """A8 as a registered analyzer name usable anywhere an analyzer is
    (contract row a8_japanese runs this same UDF distributed)."""
    from pyspark.sql import functions as F

    from search_engine_spark.functions.analyzers import (
        JapaneseTokenizer,
        get_analyzer,
        make_analyzer_udf,
    )
    from search_engine_spark.functions.cjk import jp_text_for

    fn = get_analyzer("japanese")
    tok = JapaneseTokenizer()
    texts = [jp_text_for(i) for i in range(40)]
    assert [fn(t) for t in texts] == [tok.tokenize(t) for t in texts]

    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = [r[0] for r in df.select(make_analyzer_udf("japanese")(F.col("s"))).collect()]
    assert got == [tok.tokenize(t) for t in texts]


def test_wordbreak_full_dictionary_distributed(spark):
    """A7 at REAL dictionary scale: the reference's 82k-entry frequency
    resource (WordBreakTokenizer.java:44-64 loads
    cs221_frequency_dictionary_en.txt) through the distributed pandas-UDF
    path, checked row-for-row against the single-node tokenizer. Reading
    the reference's published *data resource* at test time matches SURVEY
    §5's fixture policy (expected-value data, not code); a synthetic
    same-scale dict keeps the test meaningful if the resource is absent."""
    import os
    import time

    from pyspark.sql import functions as F

    from search_engine_spark.functions.analyzers import (
        WordBreakTokenizer,
        make_wordbreak_udf,
    )

    p = "/root/reference/src/main/resources/cs221_frequency_dictionary_en.txt"
    freq: dict[str, float] = {}
    if os.path.exists(p):
        with open(p, encoding="utf-8-sig") as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    freq[parts[0]] = float(parts[1])
    else:
        freq = {f"w{i:05d}": float(1 + i % 997) for i in range(82000)}
    assert len(freq) > 80000

    # sentences of common dict words, concatenated without spaces — the DP
    # must re-segment them; seeds vary word mix deterministically per row
    words = list(freq)[:4000]
    texts = [
        "".join(words[(7 * i + j * j) % 4000] for j in range(10)) for i in range(120)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, s string")
    udf = make_wordbreak_udf(freq)
    t0 = time.time()
    got = {
        r.i: list(r.t)
        for r in df.repartition(4).select("i", udf(F.col("s")).alias("t")).collect()
    }
    wall = time.time() - t0
    wb = WordBreakTokenizer(freq)
    exp = {i: wb.tokenize(t) for i, t in enumerate(texts)}
    assert got == exp
    # reference envelope: a paragraph under 20 s on this dict; 120 rows
    # through the distributed path stays well inside a few multiples of it
    assert wall < 120.0


def test_wordbreak_spark_udf_at_82k_dict(spark):
    """A7's fixed-dictionary Spark path at reference dictionary scale: the
    82k-entry committed fixture broadcast into the Arrow-batched pandas UDF,
    segmenting 200 concatenated-word docs distributed — every row equal to
    the single-node tokenizer. Proves the 82k dict survives closure
    broadcast + per-worker construction, not just driver-side use."""
    from pyspark.sql import functions as F

    from search_engine_spark.functions.analyzers import (
        WordBreakTokenizer,
        make_wordbreak_udf,
    )

    freq = load_82k_dict()
    words = list(freq)
    texts = []
    for i in range(200):
        ws = [words[(i * 37 + j * 11) % 82000] for j in range(12)]
        texts.append("".join(ws))
    single = WordBreakTokenizer(freq)
    exp = {i: single.tokenize(t) for i, t in enumerate(texts)}
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, content string"
    ).repartition(8)
    udf = make_wordbreak_udf(freq)
    got = {r.id: list(r.toks) for r in
           df.select("id", udf(F.col("content")).alias("toks")).collect()}
    assert got == exp


def test_auto_analyzer_routing(spark, tmp_path):
    """Script-routing analyzer: porter for latin, Japanese/CJK path for CJK
    text (unigram fallback when the fixture dict can't segment), and a
    build->query roundtrip where both sides use "auto"."""
    from search_engine_spark.functions.analyzers import get_analyzer
    from search_engine_spark.operators.query import analyze_query, search_keyword
    from search_engine_spark.sources import segments as S
    from tests.conftest import corpus_from_texts

    auto = get_analyzer("auto")
    assert auto("Running quickly") == ["run", "quickli"]
    cjk = auto("これはテストです")
    assert cjk and all(len(t) >= 1 for t in cjk)
    mixed = auto("mixed 東京 tokyo running")
    assert "mix" in mixed and "tokyo" in mixed and "run" in mixed
    assert "東" in "".join(mixed)
    assert auto("") == []

    texts = ["searching files quickly", "東京 tokyo data", "plain words here"]
    idx = str(tmp_path / "auto_idx")
    S.build_index(
        spark, corpus_from_texts(spark, texts), idx,
        analyzer="auto", n_batches=1, num_segments=2,
    )
    segs = S.load_segments(spark, idx)
    # porter side: "searching" stems identically at build and query time
    terms = analyze_query(["searching"], "auto")
    dec = S.decode_postings(segs, terms)
    assert [r.docId for r in search_keyword(dec, terms[0]).collect()] == [0]
    # CJK side: the unigram/dict tokens from doc 1 are findable
    t_cjk = analyze_query(["東京"], "auto")
    dec2 = S.decode_postings(segs, t_cjk)
    assert sorted(
        r.docId for r in search_keyword(dec2, t_cjk[0]).collect()
    ) == [1]


# ---------------------------------------------------------------------------
# code_sub: camel/snake sub-identifier analyzer (source-code payload)


def test_code_subtoken_goldens():
    from search_engine_spark.functions.analyzers import (
        code_subtoken_tokenize as tok,
        subtoken_split,
    )

    assert subtoken_split("parseJSONFile") == ["parse", "json", "file"]
    assert subtoken_split("HTTPServer") == ["http", "server"]
    assert subtoken_split("snake_case_2") == ["snake", "case", "2"]
    assert tok("def parseJsonFile(file_path): return HTTP_OK") == [
        "def", "parsejsonfile", "parse", "json", "file",
        "file_path", "file", "path", "return", "http_ok", "http", "ok",
    ]
    # whole form always present; unsplittable identifiers emit once
    assert tok("plain word") == ["plain", "word"]
    # dunder still findable by its stem
    assert tok("__init__") == ["__init__", "init"]
    # keywords are NOT stop-worded in code
    assert "if" in tok("if x in y: pass")


def test_code_subtoken_search_end_to_end(spark, tmp_index):
    """Index code with code_sub; a hump query matches, and the exact whole
    identifier ranks its definition above a subtoken-only mention."""
    from search_engine_spark.operators.rank import Scorer, score_query_daat
    from search_engine_spark.sources import segments as S
    from tests.conftest import corpus_from_texts

    texts = [
        "def parseJsonFile(path): return read(path)",   # doc 0: defines it
        "x = parse(json_file)",                          # doc 1: subtokens only
        "unrelated tokens here",
    ]
    m = S.build_index(spark, corpus_from_texts(spark, texts), tmp_index,
                      analyzer="code_sub", n_batches=1, num_segments=2)
    segs, ts = S.load_segments(spark, tmp_index), S.load_term_stats(spark, tmp_index)
    nd, avg = m["stats"]["n_docs"], m["stats"]["avgdl"]

    def ids(kw):
        rows = score_query_daat(spark, segs, ts, kw, nd, avg, Scorer("bm25"),
                                k=10, analyzer="code_sub").collect()
        return [r["docId"] for r in rows]

    assert set(ids(["parse"])) == {0, 1}          # hump match reaches doc 0
    assert ids(["parseJsonFile"])[0] == 0          # exact whole form
    assert 0 in ids(["json"]) and 1 in ids(["json"])
