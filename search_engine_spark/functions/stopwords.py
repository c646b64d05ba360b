"""Frozen English stop-word list.

Parity target: the reference's static 127-word set
(``/root/reference/src/main/java/edu/uci/ics/cs221/analysis/StopWords.java:13-143``),
which its docstring says not to change "for uniform behavior in testing".
Kept as a frozenset; broadcast into pandas UDF closures (small constant —
cheap to pickle per task).
"""

from __future__ import annotations

STOP_WORDS: frozenset[str] = frozenset(
    {
        "i", "me", "my", "myself", "we", "our", "ours", "ourselves",
        "you", "your", "yours", "yourself", "yourselves",
        "he", "him", "his", "himself", "she", "her", "hers", "herself",
        "it", "its", "itself", "they", "them", "their", "theirs", "themselves",
        "what", "which", "who", "whom", "this", "that", "these", "those",
        "am", "is", "are", "was", "were", "be", "been", "being",
        "have", "has", "had", "having", "do", "does", "did", "doing",
        "a", "an", "the", "and", "but", "if", "or", "because", "as",
        "until", "while", "of", "at", "by", "for", "with", "about",
        "against", "between", "into", "through", "during", "before",
        "after", "above", "below", "to", "from", "up", "down", "in",
        "out", "on", "off", "over", "under", "again", "further", "then",
        "once", "here", "there", "when", "where", "why", "how", "all",
        "any", "both", "each", "few", "more", "most", "other", "some",
        "such", "no", "nor", "not", "only", "own", "same", "so", "than",
        "too", "very", "s", "t", "can", "will", "just", "don", "should",
        "now",
    }
)

# Sorted tuple for deterministic SQL-literal generation (oracle parity).
STOP_WORDS_SORTED: tuple[str, ...] = tuple(sorted(STOP_WORDS))
