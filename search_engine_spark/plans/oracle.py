"""Single-node reference oracle for rank-identity tests (SURVEY.md §5 item 4).

Implements the exact scoring semantics of SURVEY.md §2.6 (reference
``InvertedIndexManager.searchTfIdf``, IIM:1131-1315) and the north-rule BM25
in plain python/numpy over an in-memory corpus — no Spark. The pytest suite
asserts the distributed paths return identical top-k docIds and scores
(abs tol 1e-9).
"""

from __future__ import annotations

import math
from collections import Counter

from ..functions.analyzers import get_analyzer
from ..operators.query import analyze_query


class OracleIndex:
    def __init__(self, docs: dict[int, str], analyzer: str = "porter"):
        fn = get_analyzer(analyzer)
        self.analyzer = analyzer
        self.tokens = {d: fn(t) for d, t in docs.items()}
        self.tf: dict[str, dict[int, int]] = {}
        self.positions: dict[str, dict[int, list[int]]] = {}
        self.dl: dict[int, int] = {}
        for d, toks in self.tokens.items():
            self.dl[d] = len(toks)
            for i, t in enumerate(toks):
                self.tf.setdefault(t, {})[d] = self.tf.get(t, {}).get(d, 0) + 1
                self.positions.setdefault(t, {}).setdefault(d, []).append(i)
        self.n_docs = len(docs)
        self.avgdl = sum(self.dl.values()) / self.n_docs if self.n_docs else 0.0

    def df(self, term: str) -> int:
        return len(self.tf.get(term, {}))

    # --- boolean ---------------------------------------------------------
    def search_keyword(self, term: str) -> set[int]:
        return set(self.tf.get(term, {}))

    def search_and(self, terms: list[str]) -> set[int]:
        ts = sorted(set(terms))
        if not ts:
            return set()
        out = self.search_keyword(ts[0])
        for t in ts[1:]:
            out &= self.search_keyword(t)
        return out

    def search_or(self, terms: list[str]) -> set[int]:
        out: set[int] = set()
        for t in set(terms):
            out |= self.search_keyword(t)
        return out

    def search_phrase(self, terms: list[str]) -> set[int]:
        # reference quirk: repeated tokens keep the LAST offset (IIM:966-977)
        offs = {t: i for i, t in enumerate(terms)}
        if not offs:
            return set()
        items = sorted(offs.items(), key=lambda kv: kv[1])
        docs = None
        acc: dict[int, set[int]] = {}
        for term, off in items:
            plists = self.positions.get(term, {})
            cur = {d: {p - off for p in ps} for d, ps in plists.items()}
            if docs is None:
                docs = set(cur)
                acc = cur
            else:
                docs &= set(cur)
                acc = {d: acc[d] & cur[d] for d in docs}
                docs = {d for d in docs if acc[d]}
        return {d for d in (docs or set()) if acc[d]}

    # --- ranked ----------------------------------------------------------
    def score(
        self,
        keywords: list[str],
        scorer: str = "bm25",
        k1: float = 1.2,
        b: float = 0.75,
    ) -> dict[int, float]:
        qtfs = Counter(analyze_query(keywords, self.analyzer))
        dot: dict[int, float] = {}
        ln: dict[int, float] = {}
        for t in sorted(qtfs):
            dft = self.df(t)
            if dft == 0:
                continue
            if scorer == "bm25":
                idf = math.log((self.n_docs - dft + 0.5) / (dft + 0.5) + 1.0)
                for d, tf in self.tf[t].items():
                    c = (
                        qtfs[t]
                        * idf
                        * tf
                        * (k1 + 1.0)
                        / (tf + k1 * (1.0 - b + b * self.dl[d] / self.avgdl))
                    )
                    dot[d] = dot.get(d, 0.0) + c
            else:
                idf = math.log10(self.n_docs / dft)
                wq = qtfs[t] * idf
                for d, tf in self.tf[t].items():
                    wd = tf * idf
                    dot[d] = dot.get(d, 0.0) + wd * wq
                    ln[d] = ln.get(d, 0.0) + wd * wd
        if scorer == "bm25":
            return dot
        return {
            d: (dot[d] / math.sqrt(ln[d]) if ln.get(d, 0.0) > 0 else 0.0) for d in dot
        }

    def topk(
        self, keywords: list[str], k: int | None, scorer: str = "bm25", ties: str = "desc"
    ) -> list[tuple[int, float]]:
        scores = self.score(keywords, scorer)
        key = (lambda it: (-it[1], -it[0])) if ties == "desc" else (lambda it: (-it[1], it[0]))
        ranked = sorted(scores.items(), key=key)
        return ranked[:k] if k is not None else ranked
