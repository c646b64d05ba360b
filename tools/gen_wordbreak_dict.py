"""Generate the committed reference-scale word-break dictionary fixture.

The reference ships an 82k-entry frequency resource
(``analysis/WordBreakTokenizer.java:44-64`` loads
``cs221_frequency_dictionary_en.txt``). That data is not copied; this
synthesizes a dictionary of the SAME SCALE deterministically — pronounceable
syllable-composed words (so long concatenations are segmentable and
ambiguous, like real English) with Zipf-distributed frequencies — so the
20 s latency envelope and the A7/A8 Spark paths are exercised at true
dictionary scale, not extrapolated from a 5k fixture.

Usage: python tools/gen_wordbreak_dict.py [n_entries] [out_path]
Defaults: 82000 tests/fixtures/wordbreak_dict_82k.txt
Output format matches the reference resource: ``word<space>frequency``.
"""

from __future__ import annotations

import os
import sys

ONSETS = ["", "b", "c", "d", "f", "g", "h", "j", "k", "l", "m", "n", "p",
          "r", "s", "t", "v", "w", "z", "ch", "sh", "th", "br", "cr", "dr",
          "fr", "gr", "pr", "tr", "st", "sp", "pl", "cl", "bl", "fl", "sl"]
VOWELS = ["a", "e", "i", "o", "u", "ai", "ea", "ou", "io"]
CODAS = ["", "b", "d", "g", "k", "l", "m", "n", "p", "r", "s", "t", "x",
         "ck", "ng", "nt", "st", "rd", "ll", "ss"]


def syllable(i: int) -> str:
    o = ONSETS[i % len(ONSETS)]
    v = VOWELS[(i // len(ONSETS)) % len(VOWELS)]
    c = CODAS[(i // (len(ONSETS) * len(VOWELS))) % len(CODAS)]
    return o + v + c


def generate(n: int) -> list[tuple[str, int]]:
    n_syll = len(ONSETS) * len(VOWELS) * len(CODAS)  # 6480 distinct
    words: list[str] = []
    seen: set[str] = set()
    # 1-syllable words first (short, high-frequency — these create the
    # segmentation ambiguity an 82k dict has), then 2-syllable pairs
    # enumerated as (a, b) = divmod(j, n_syll) so the pair space is n² (42M),
    # far beyond any requested n; string-level collisions (different pairs
    # concatenating to the same word) are deduped.
    i = 0
    while len(words) < n:
        if i < n_syll:
            w = syllable(i)
        else:
            a, b = divmod(i - n_syll, n_syll)
            if a >= n_syll:
                raise ValueError(f"exhausted the 2-syllable space before {n}")
            w = syllable(b) + syllable((7 * a + 13 * b + 3) % n_syll)
        i += 1
        if w and w not in seen:
            seen.add(w)
            words.append(w)
    # Zipf frequencies over the generation order (short words most frequent)
    return [(w, max(1, int(1e9 / (r + 1) ** 1.1))) for r, w in enumerate(words)]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 82000
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "wordbreak_dict_82k.txt",
    )
    entries = generate(n)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        for w, fr in entries:
            f.write(f"{w} {fr}\n")
    print(f"{out}: {len(entries)} entries, {os.path.getsize(out)} bytes")


if __name__ == "__main__":
    main()
