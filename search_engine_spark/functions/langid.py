"""Character-n-gram Naive Bayes language ID — the model-shaped upgrade of
the t1 marker-word heuristic (``operators/textstats.py``).

Multinomial NB over hashed byte trigrams, trained deterministically from
the committed fixture ``data/langid_train.tsv`` (self-authored sentences,
24 per language). Scoring is a vectorized pandas UDF whose per-batch work
is pure numpy over ONE concatenated byte buffer (trigram hashing, masked
row boundaries, per-row bincount reduction) — the exact UDF shape a real
fastText-grade model swap needs, with no per-row python in the scoring
path.

Determinism contract: the distributed UDF and the single-node
:func:`predict_pdf` accumulate per-row scores in identical window order,
so predictions (and raw scores) are bit-identical — the driver contract
checks the Spark output value-exactly against a side table computed
single-node (a7-style oracle).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

DIM = 1 << 15
ALPHA = 0.5
_SEP = b"\x00\x00"  # row separator; windows touching it are masked out

_FIXTURE = os.path.join(os.path.dirname(__file__), "data", "langid_train.tsv")


def _read_fixture_text() -> str:
    """Training fixture bytes, readable from a plain checkout AND from the
    ``--py-files`` zip (tools/package.py ships the tsv inside the archive;
    a plain open() cannot reach zip members, importlib.resources can)."""
    if os.path.exists(_FIXTURE):
        return open(_FIXTURE, encoding="utf-8").read()
    from importlib import resources

    return (
        resources.files(__package__)
        .joinpath("data/langid_train.tsv")
        .read_text(encoding="utf-8")
    )


def load_training_pairs(path: str | None = None) -> list[tuple[str, str]]:
    text = (
        open(path, encoding="utf-8").read()
        if path is not None
        else _read_fixture_text()
    )
    out = []
    for line in text.splitlines():
        if line:
            lang, t = line.split("\t", 1)
            out.append((lang, t))
    return out


def _codes_and_mask(data: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Hashed trigram code per byte window + validity mask (no separator
    byte inside the window)."""
    a = data.astype(np.int64)
    codes = (((a[:-2] * 31 + a[1:-1]) * 31) + a[2:]) % DIM
    valid = (a[:-2] != 0) & (a[1:-1] != 0) & (a[2:] != 0)
    return codes, valid


class NBLangModel:
    """log P(trigram|lang) table + ordered language list."""

    def __init__(self, langs: list[str], logp: np.ndarray, logprior: np.ndarray):
        self.langs = langs
        self.logp = logp  # (n_langs, DIM) float64
        self.logprior = logprior  # (n_langs,)

    def predict_pdf(self, texts: pd.Series) -> pd.Series:
        """Vectorized batch prediction -> language code ('und' when a row
        has no scoreable trigram). One numpy pass over the whole batch."""
        bs = [t.lower().encode("utf-8") if isinstance(t, str) else b"" for t in texts]
        nrows = len(bs)
        if nrows == 0:
            return pd.Series([], dtype=object)
        joined = _SEP.join(bs)
        data = np.frombuffer(joined, dtype=np.uint8)
        if len(data) < 3:
            return pd.Series(["und"] * nrows, index=texts.index, dtype=object)
        codes, valid = _codes_and_mask(data)
        lens = np.fromiter((len(b) for b in bs), np.int64, nrows)
        starts = np.zeros(nrows, dtype=np.int64)
        np.cumsum(lens[:-1] + len(_SEP), out=starts[1:])
        # window w belongs to the row whose byte range contains w's start;
        # separator windows are masked, so assignment only matters for valid
        row_of = np.searchsorted(starts, np.arange(len(codes)), "right") - 1
        sel = np.flatnonzero(valid)
        codes_v, rows_v = codes[sel], row_of[sel]
        n_valid = np.bincount(rows_v, minlength=nrows)
        scores = np.empty((len(self.langs), nrows))
        for li in range(len(self.langs)):
            w = self.logp[li][codes_v]
            scores[li] = np.bincount(rows_v, weights=w, minlength=nrows)
            scores[li] += self.logprior[li]
        best = np.argmax(scores, axis=0)  # ties -> lowest index (lang order)
        out = np.array(self.langs, dtype=object)[best]
        out[n_valid == 0] = "und"
        return pd.Series(out, index=texts.index, dtype=object)


def train(pairs: list[tuple[str, str]]) -> NBLangModel:
    """Deterministic multinomial NB fit (add-ALPHA smoothing) over hashed
    byte trigrams of the lowercased utf-8 training texts."""
    langs = sorted({lang for lang, _ in pairs})
    counts = np.zeros((len(langs), DIM), dtype=np.float64)
    n_docs = np.zeros(len(langs), dtype=np.float64)
    li_of = {lang: i for i, lang in enumerate(langs)}
    for lang, text in pairs:
        data = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8)
        if len(data) >= 3:
            codes, valid = _codes_and_mask(data)
            counts[li_of[lang]] += np.bincount(
                codes[valid], minlength=DIM
            ).astype(np.float64)
        n_docs[li_of[lang]] += 1
    tot = counts.sum(axis=1, keepdims=True)
    logp = np.log((counts + ALPHA) / (tot + ALPHA * DIM))
    logprior = np.log(n_docs / n_docs.sum())
    return NBLangModel(langs, logp, logprior)


_DEFAULT: NBLangModel | None = None


def default_model() -> NBLangModel:
    """Model trained on the full committed fixture (cached per process)."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = train(load_training_pairs())
    return _DEFAULT


def heldout_accuracy(train_per_lang: int = 18) -> tuple[float, int]:
    """Train on the first ``train_per_lang`` sentences per language, test
    on the rest -> (accuracy, n_test). The BENCH.md figure."""
    pairs = load_training_pairs()
    by_lang: dict[str, list[str]] = {}
    for lang, text in pairs:
        by_lang.setdefault(lang, []).append(text)
    tr, te = [], []
    for lang, texts in by_lang.items():
        tr += [(lang, t) for t in texts[:train_per_lang]]
        te += [(lang, t) for t in texts[train_per_lang:]]
    m = train(tr)
    pred = m.predict_pdf(pd.Series([t for _, t in te]))
    ok = sum(p == lang for p, (lang, _) in zip(pred, te))
    return ok / len(te), len(te)


def lang_id_nb(df, text: str = "content", id_col: str = "docId"):
    """Distributed NB language ID: (id, lang_nb) via an Arrow-batched
    pandas UDF over :func:`default_model` (the model table is ~1 MB of
    float64 — rebuilt once per worker process from the packaged fixture,
    not shipped per task)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nb(texts: pd.Series) -> pd.Series:
        return default_model().predict_pdf(texts)

    return df.select(F.col(id_col), _nb(F.col(text)).alias("lang_nb"))
