"""CJK dictionary-analyzer data (reference operator A8).

Two data sets:

- :data:`JAPANESE_STOP_WORDS` — the reference's frozen 45-entry Japanese
  stop-word list (``JapaneseStopWords.java:17-63``). Like the 127-word
  English list (A4, :mod:`.stopwords`) this is *behavioral contract data*:
  the reference's tests require exactly this set, so it is reproduced
  verbatim (expected-value data, not code).

- :data:`CJK_FREQ_DICT` — a deterministic frequency-dictionary FIXTURE.
  The reference loads an 82k-entry ``JapaneseDic.txt`` resource
  (``JapaneseTokenizer.java:21-33``, GBK-encoded ``freq word`` lines); that
  data file is NOT copied. This fixture has the same *shape* (word ->
  frequency, particles far more frequent than content words, multi-char
  words whose substrings are themselves words so the DP genuinely has to
  arbitrate splits) and is entirely self-authored. Frequencies are distinct
  so log-probability ties cannot make segmentation ambiguous across
  engines. Production swaps in a full dictionary via
  ``JapaneseTokenizer(freq_dict=...)`` / ``make_wordbreak_udf`` unchanged.
"""

from __future__ import annotations

# JapaneseStopWords.java:17-63 — frozen reference list, order-insensitive set.
JAPANESE_STOP_WORDS: frozenset[str] = frozenset(
    {
        "と", "》", "《", "が", "だ", "て", "を", "は", "に", "た",
        "。", "」", "「", "…", "も", "で", "か", "ん", "う", "その",
        "？", "ます", "です", "！", "よ", "お", "｜", "この", "――", "ぬ",
        "な", "ね", "まで", "だけ", "じゃ", "って", "ながら", "という", "でも", "し",
        "など", "けど", "たり", "らしい", "じ",
    }
)

# Self-authored fixture: grammatical particles (high frequency — most are
# also stop words, so the remove-after-DP path is exercised) + content
# words. 日/本/日本, 学/学生/学校/先生 give overlapping-substring ambiguity.
CJK_FREQ_DICT: dict[str, int] = {
    # particles / function words (stop words in JAPANESE_STOP_WORDS)
    "は": 9973, "が": 9941, "を": 9907, "に": 9887, "で": 9851,
    "と": 9833, "も": 9811, "た": 9787, "て": 9781, "です": 9767,
    "ます": 9743, "か": 9739, "この": 9721, "その": 9719, "な": 9697,
    # content words (kept by the analyzer)
    "私": 8923, "猫": 8867, "犬": 8839, "本": 8803, "水": 8779,
    "空": 8747, "山": 8731, "川": 8699, "花": 8677, "星": 8663,
    "雨": 8647, "風": 8627, "海": 8599, "森": 8573, "月": 8563,
    "日": 8543, "人": 8537, "家": 8527, "車": 8521, "木": 8513,
    "食べる": 7817, "飲む": 7793, "見る": 7789, "行く": 7759, "来る": 7757,
    "読む": 7753, "書く": 7741, "話す": 7727, "聞く": 7723, "走る": 7717,
    "好き": 6917, "大きい": 6911, "小さい": 6907, "新しい": 6899, "古い": 6883,
    "学生": 5881, "先生": 5879, "学校": 5861, "日本": 5857, "東京": 5851,
    "電車": 5849, "会社": 5843, "友達": 5839, "言葉": 5827, "辞書": 5813,
}

# Deterministic text synthesis for the a8 contract query: words a pure
# function of (doc_id, position) — always segmentable (every piece is a
# dict word), mixes stop words in so removal is exercised. Sorted for a
# stable order independent of dict insertion order.
_VOCAB: list[str] = sorted(CJK_FREQ_DICT)


def jp_text_for(doc_id: int) -> str:
    """Deterministic CJK text for a docId (5-10 dictionary words)."""
    n = 5 + (doc_id * 31 + 7) % 6
    return "".join(
        _VOCAB[(doc_id * 131 + i * 2654435761 + 97) % len(_VOCAB)] for i in range(n)
    )
