"""Text-analysis pipeline (reference operators A1-A9) as pure functions +
vectorized pandas UDF factories.

Parity targets (``/root/reference/src/main/java/edu/uci/ics/cs221/analysis/``):

- A2 ``NaiveAnalyzer.java:13-15``     — lowercase + split on ``\\s+``.
- A3 ``PunctuationTokenizer.java:19-49`` — whitespace split, ``, . ; ? !``
  replaced by space, re-split, empties dropped, stop words removed.
  (Golden behavior per the reference test suite: *all* empty tokens are
  dropped — e.g. ``Team4PunctuationTokenizerTest.test3`` — and non-listed
  punctuation like ``:`` or ``)`` is kept as token content —
  ``Team2PunctuationTokenizerTest.test1/test3``.)
- A4 ``StopWords.java:13-143``        — frozen 127-word list.
- A5 ``PorterStemmer.java``           — see :mod:`.porter`.
- A6 ``ComposableAnalyzer.java:13-23`` — tokenize then stem, one pass.
- A9 positional tokenization (``InvertedIndexManager.java:169-180``) —
  handled downstream in the posting builder (positions are token indices in
  the analyzed token list).

The only Spark-visible surface is :func:`make_analyzer_udf` /
:func:`tokens_column` — a single Arrow-batched pandas UDF per analyzer; no
per-row Python UDFs. A code-aware tokenizer (non-alphanumeric splits) covers
the source-code payload of the north rule.
"""

from __future__ import annotations

import math
import re
from collections.abc import Callable, Iterable

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from .porter import porter_stem
from .stopwords import STOP_WORDS

Tokenizer = Callable[[str], list[str]]

_PUNCT = ",.;?!"
_PUNCT_TRANS = str.maketrans({c: " " for c in _PUNCT})


def naive_tokenize(text: str) -> list[str]:
    """A2: lowercase + whitespace split (NaiveAnalyzer.java:13-15).

    Python ``str.split()`` drops empty tokens, which matches the effective
    reference behavior on the golden corpus (no leading-whitespace docs in
    fixtures; the punctuation pipeline drops empties anyway).
    """
    return text.lower().split()


def punctuation_tokenize(text: str) -> list[str]:
    """A3: naive split -> strip ``, . ; ? !`` -> re-split -> de-stop.

    Implemented as ONE C-level translate+split over the whole text: mapping
    the five listed chars to spaces then whitespace-splitting yields exactly
    the reference's per-token re-split in the same order (tokens without
    listed punctuation pass through unchanged; empties vanish in split()).
    The per-token Python loop this replaces was ~20% of build-kernel CPU.
    """
    return [
        t for t in text.lower().translate(_PUNCT_TRANS).split()
        if t not in STOP_WORDS
    ]


_WORD_RE = re.compile(r"\w+")


def code_tokenize(text: str) -> list[str]:
    """Code-aware tokenizer for the source-code payload: lowercase, split on
    non-``[a-z0-9_]`` runs, keep identifiers/keywords, drop stop words.

    Same operator shape as A3 (SURVEY.md §2.2 note on code payloads).
    ``\\w`` runs == runs of ``ch.isalnum() or ch == "_"`` (Python's re module
    classes ``\\w`` as Unicode alphanumerics + underscore), so one C-level
    findall replaces the former per-char Python loop (verified equivalent on
    punctuation/unicode/underscore edge cases).
    """
    return [t for t in _WORD_RE.findall(text.lower()) if t not in STOP_WORDS]


# Camel-hump splitter (the standard public pattern): ALLCAPS acronym runs
# that precede a capitalized word ("HTTPServer" -> HTTP, Server), capitalized
# or lowercase words, trailing acronyms, digit runs.
_HUMP_RE = re.compile(r"[A-Z]+(?=[A-Z][a-z0-9])|[A-Z]?[a-z]+|[A-Z]+|[0-9]+")
_IDENT_RE = re.compile(r"[A-Za-z0-9_]+")


def subtoken_split(ident: str) -> list[str]:
    """Split one identifier into lowercase subtokens: ``_``/digit boundaries
    and camel humps. ``parseJSONFile`` -> [parse, json, file];
    ``snake_case_2`` -> [snake, case, 2]; ``HTTPServer`` -> [http, server]."""
    out: list[str] = []
    for part in ident.split("_"):
        out.extend(m.group(0).lower() for m in _HUMP_RE.finditer(part))
    return out


def code_subtoken_tokenize(text: str) -> list[str]:
    """Code-search tokenizer for the source-code payload: every identifier
    emits its lowercased whole form, followed by its camel/snake subtokens
    when it actually splits — so ``parseJsonFile(x)`` is findable as
    ``parsejsonfile`` AND as ``parse``/``json``/``file`` (the Zoekt /
    OpenGrok-style sub-identifier indexing code search needs; exact-form
    queries still rank the exact definition above hump matches because the
    whole form is its own term). Case must survive until the split, so this
    tokenizes the ORIGINAL text, unlike :func:`code_tokenize`. No stop-word
    removal: in code, ``if``/``in``/``is`` are semantics, not noise."""
    out: list[str] = []
    for m in _IDENT_RE.finditer(text):
        ident = m.group(0)
        subs = subtoken_split(ident)
        whole = ident.lower()
        out.append(whole)
        if subs != [whole]:  # "__init__" still emits "init"
            out.extend(subs)
    return out


def trigram_tokenize(text: str) -> list[str]:
    """Char-trigram tokenizer for byte-level substring/regex search over raw
    code content — the Google Code Search / Zoekt index unit (Cox, "Regular
    Expression Matching with a Trigram Index"). Emits the DISTINCT (sorted)
    3-char substrings of the ORIGINAL text: case, punctuation and whitespace
    all survive, because a substring query must match them exactly. tf is 1
    by construction (membership is the only signal substring search needs),
    which also keeps build postings at one per (trigram, doc) regardless of
    how often a trigram repeats. Trigram posting lists are the heaviest in
    any index (df approaches n_docs for common trigrams) — the build's
    sampled heavy-term salting is what makes this analyzer viable at scale.
    Case-insensitive variant: :func:`trigram_fold_tokenize`."""
    if text is None or len(text) < 3:
        return []
    return sorted({text[i : i + 3] for i in range(len(text) - 2)})


def trigram_fold_tokenize(text: str) -> list[str]:
    """Case-folded trigrams (index side of case-insensitive substring
    search; the query side folds the needle and verifies with a folded
    ``contains``)."""
    return trigram_tokenize(text.lower() if text is not None else None)


def porter_analyze(text: str, tokenize: Tokenizer = punctuation_tokenize) -> list[str]:
    """A6 ComposableAnalyzer(PunctuationTokenizer, PorterStemmer)."""
    return [porter_stem(t) for t in tokenize(text)]


def wordbreak_selfdict(text: str) -> list[str]:
    """A7 as a distributed-safe analyzer: DP word-break of the doc's own
    whitespace-concatenated text against a dictionary built from the doc's
    own token frequencies. Guaranteed breakable, pure per-row function (no
    broadcast state), so it runs inside any executor-side kernel; the fixed
    82k-dictionary mode of the reference is :func:`make_wordbreak_udf`."""
    toks = text.lower().split()
    if not toks:
        return []
    from collections import Counter

    return WordBreakTokenizer(dict(Counter(toks))).tokenize("".join(toks))


def japanese_tokenize(text: str) -> list[str]:
    """A8 as a registered analyzer: dictionary-DP CJK segmentation + Japanese
    stop-word removal over the committed fixture dict (:mod:`.cjk`). The
    tokenizer (with its precomputed log-prob table) is built once per
    process, not per row."""
    global _JAPANESE
    if _JAPANESE is None:
        _JAPANESE = JapaneseTokenizer()
    return _JAPANESE.tokenize(text)


_JAPANESE = None

# CJK unified ideographs + hiragana/katakana — the script ranges the auto
# router treats as Japanese-analyzed text
_CJK_RE = re.compile(r"[぀-ヿ一-鿿]")
_CJK_SPLIT_RE = re.compile(r"([぀-ヿ一-鿿]+)")


def auto_tokenize(text: str) -> list[str]:
    """Script-routing analyzer: documents containing CJK characters route to
    the Japanese dictionary tokenizer (A8), everything else to the porter
    chain (A3-A6) — the per-document analyzer dispatch a mixed-language
    corpus needs (cf. Lucene's per-field analyzer wrappers; the reference
    picks ONE analyzer per index). Routing is per-SPAN, not
    per-document: each maximal CJK run segments via the dictionary DP
    (falling back to CJK UNIGRAMS — the Lucene StandardAnalyzer convention —
    when the fixture dict cannot break it) and each non-CJK span
    porter-analyzes, so a CJK span tokenizes identically whether it arrives
    alone (a query) or inside mixed text (a document) — build and query
    sides agree by construction."""
    if not _CJK_RE.search(text):
        return porter_analyze(text)
    out: list[str] = []
    for span in _CJK_SPLIT_RE.split(text):
        if not span:
            continue
        if _CJK_RE.match(span):
            try:
                out.extend(japanese_tokenize(span))
            except ValueError:
                out.extend(span)  # one token per CJK char
        else:
            out.extend(porter_analyze(span))
    return out


def identity_tokenize(text: str) -> list[str]:
    """Pass-through for PRE-ANALYZED terms (fielded ``col\x1ftoken`` terms,
    dictionary-expansion output): the input IS the term. Needed because
    python ``str.split()`` treats the U+001F field separator as whitespace,
    so even the naive analyzer would split a namespaced term apart."""
    return [text] if text else []


# Joiner inside a shingle (bigram) term: U+001E record separator — like the
# U+001F field separator, it is whitespace to python str.split and can never
# be produced by any tokenizer, so "a\x1eb" cannot collide with a real token.
SHINGLE_SEP = "\x1e"


def make_shingle_analyzer(base: str) -> Tokenizer:
    """Bigram (word-shingle) analyzer over a base tokenizer — the Lucene
    ShingleFilter shape. Token i of the output is
    ``base[i] + SHINGLE_SEP + base[i+1]`` at position i, so a phrase of L
    base tokens is L-1 consecutive shingles: phrase search over a shingle
    field seeks L-1 (usually far rarer) bigram posting lists instead of
    decoding L unigram position lists, and a 2-token phrase needs no
    position decode at all (see ``query.search_phrase_shingled``)."""
    fn = get_analyzer(base)

    def tok(text: str) -> list[str]:
        t = fn(text)
        return [t[i] + SHINGLE_SEP + t[i + 1] for i in range(len(t) - 1)]

    return tok


ANALYZERS: dict[str, Tokenizer] = {
    "identity": identity_tokenize,
    "naive": naive_tokenize,
    "punctuation": punctuation_tokenize,
    "code": code_tokenize,
    "code_sub": code_subtoken_tokenize,
    "trigram": trigram_tokenize,
    "trigram_fold": trigram_fold_tokenize,
    "porter": porter_analyze,
    "porter_code": lambda text: [porter_stem(t) for t in code_tokenize(text)],
    "wordbreak": wordbreak_selfdict,
    "japanese": japanese_tokenize,
    "auto": auto_tokenize,
}


def get_analyzer(name: str) -> Tokenizer:
    if name.startswith("shingle:"):
        # derived on demand (executors resolve by NAME, so the registry
        # composes without shipping closures): "shingle:porter" etc.
        return make_shingle_analyzer(name.split(":", 1)[1])
    try:
        return ANALYZERS[name]
    except KeyError:
        raise ValueError(f"unknown analyzer {name!r}; one of {sorted(ANALYZERS)}") from None


def make_analyzer_udf(name: str):
    """A1: Arrow-batched pandas UDF ``string -> array<string>``.

    ``name`` (not the function) is captured so the closure pickles small;
    the analyzer is resolved on the executor.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(StringType()))
    def analyze(texts: pd.Series) -> pd.Series:
        fn = get_analyzer(name)
        return texts.map(lambda t: fn(t) if t is not None else [])

    return analyze


def tokens_column(col, analyzer: str = "porter"):
    """tokens = analyze(col). Uses built-in expressions for the naive
    analyzer (stays inside whole-stage codegen); pandas UDF otherwise."""
    if analyzer == "naive":
        return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != F.lit(""))
    return make_analyzer_udf(analyzer)(col)


def make_wordbreak_udf(freq_dict: dict[str, float]):
    """A7/A8 fixed-dictionary mode as a Spark operator: Arrow-batched pandas
    UDF ``string -> array<string>`` over a shared frequency dictionary
    (reference ``WordBreakTokenizer.java:44-64`` loads an 82k-entry resource;
    ``JapaneseTokenizer.java:19-33`` the same shape for a CJK dict). The dict
    ships to executors once via closure capture — at cluster scale wrap it in
    ``spark.sparkContext.broadcast`` and capture the broadcast instead; the
    tokenizer (DP tables included) is built once per executor batch stream,
    not per row."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(StringType()))
    def wb(texts: pd.Series) -> pd.Series:
        tok = WordBreakTokenizer(freq_dict)
        return texts.map(lambda t: tok.tokenize(t) if t else [])

    return wb


# --- A7/A8: DP word-break tokenizer (optional operator) ---------------------


class WordBreakTokenizer:
    """A7: DP word-break maximizing sum of log-probabilities
    (``WordBreakTokenizer.java:67-120``): O(n^2) splits over a frequency
    dictionary; raises if the text cannot be fully segmented; stop words
    removed from the result.

    The dictionary is pluggable: ``{word: frequency}``. The reference ships
    an 82k-entry English dictionary resource; tests here use a small fixture
    (same algorithm, no data copied).
    """

    def __init__(self, freq_dict: dict[str, float]):
        if not freq_dict:
            raise ValueError("empty word-break dictionary")
        total = float(sum(freq_dict.values()))
        self._logp = {w.lower(): math.log(f / total) for w, f in freq_dict.items() if f > 0}
        self._max_len = max(len(w) for w in self._logp)

    def tokenize(self, text: str) -> list[str]:
        s = text.lower()
        # strip whitespace like the reference (it word-breaks contiguous text)
        s = "".join(s.split())
        n = len(s)
        if n == 0:
            return []
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        back = [-1] * (n + 1)
        best[0] = 0.0
        for i in range(1, n + 1):
            lo = max(0, i - self._max_len)
            for j in range(lo, i):
                if best[j] == NEG:
                    continue
                w = s[j:i]
                lp = self._logp.get(w)
                if lp is not None and best[j] + lp > best[i]:
                    best[i] = best[j] + lp
                    back[i] = j
        if best[n] == NEG:
            raise ValueError(f"text cannot be word-broken: {text[:50]!r}")
        toks: list[str] = []
        i = n
        while i > 0:
            j = back[i]
            toks.append(s[j:i])
            i = j
        toks.reverse()
        return [t for t in toks if t not in STOP_WORDS]


class JapaneseTokenizer:
    """A8: dictionary-driven DP segmentation of CJK text
    (``JapaneseTokenizer.java:19-84`` + ``JapaneseStopWords.java``).

    Reference semantics mirrored:

    - empty text -> ``[]``; text containing any of ``, . ; ? !`` raises
      (``JapaneseTokenizer.java:40-44`` throws on punctuation input);
    - segmentation maximizes the sum of per-word ``log(freq/total)`` over a
      FULL segmentation into dictionary words, raising if none exists
      (``:45-78``). The reference uses an O(n^3) interval DP; the objective
      is additive over segments, so the O(n * max_word_len) Viterbi DP in
      :class:`WordBreakTokenizer` finds the same optimum (fixture
      frequencies are distinct, so the optimum is unique and tie order is
      moot);
    - Japanese stop words are removed from the result AFTER segmentation
      (``:82``, ``results.removeAll``).

    The dictionary is pluggable; the default is the committed fixture
    (:data:`search_engine_spark.functions.cjk.CJK_FREQ_DICT`) — the
    reference's 82k-entry ``JapaneseDic.txt`` resource is NOT copied.
    CJK has no case or (in this pipeline) whitespace, so the inner
    word-break's lower()/whitespace-strip are identity transforms here.
    """

    PUNCT = (",", ".", ";", "?", "!")

    def __init__(self, freq_dict: dict[str, float] | None = None):
        from .cjk import CJK_FREQ_DICT, JAPANESE_STOP_WORDS

        self._wb = WordBreakTokenizer(freq_dict or CJK_FREQ_DICT)
        self._stop = JAPANESE_STOP_WORDS

    def tokenize(self, text: str) -> list[str]:
        if any(p in text for p in self.PUNCT):
            raise ValueError(
                "punctuation should not be input to JapaneseTokenizer"
            )
        return [t for t in self._wb.tokenize(text) if t not in self._stop]


def term_positions(tokens: Iterable[str]) -> dict[str, list[int]]:
    """A9: token list -> {term: sorted positions} (IIM:169-180)."""
    pos: dict[str, list[int]] = {}
    for i, t in enumerate(tokens):
        pos.setdefault(t, []).append(i)
    return pos
