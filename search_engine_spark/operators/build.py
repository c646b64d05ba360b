"""Index construction (reference operators B1-B5, S8).

Reference lifecycle (``InvertedIndexManager.java``): ``addDocument`` buffers
per-term TreeMaps (IIM:163-201), ``flush`` writes a term-sorted segment
triplet (IIM:301-328), ``mergeSegments`` sort-merges pairs (IIM:583-687).

Spark-first rebuild — the whole build is ONE shuffle:

    corpus (docId, content)
      -> mapInPandas(posting_kernel)         # B1: tokenize + per-doc postings
         (term, docId, tf, dl, posbin)       #     positions already varbyte-packed
      -> salt heavy terms                    # skew: term -> (term, salt)
      -> repartition(term, salt)             # B2/B3: the one (hash) shuffle
      -> mapInArrow(segment_encoder)         # S8: numpy lexsort + packed rows,
      -> parquet segments/                   #     straight off Arrow buffers;
                                             # term-sorted files => row-group
                                             # min/max pushdown on `term`
(term stats fall out of the packed rows with a cheap second-stage agg —
no re-shuffle of raw postings.)

Scale notes (100 TB):
- postings never materialize per-token rows (no posexplode): the kernel
  emits per-(doc,term) rows straight from Arrow batches.
- heavy terms (code keywords: ``def``, ``return`` ...) are salted into
  ``n_salts`` sub-lists BEFORE the range shuffle, so no reducer gets a
  whole mega posting list; each salted sub-list keeps docId order, so the
  delta codec stays valid; the query path unions salted rows.
- dl (doc length) is denormalized into each packed row, so BM25 scoring
  needs NO join against a doclens table at query time.
- the build is batched by a pure function of docId (``batch_of``); each
  batch commits atomically into the manifest -> resumable (see segments.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.analyzers import get_analyzer
from ..functions.codec import varbyte_decode, varbyte_encode
from ..functions.predicates import isin_expr

# positions travel as a delta+varbyte blob PER POSTING (`posbin`), packed on
# the map side: an array<int> column through the shuffle costs ~5x in
# UnsafeRow width, sort time, and Arrow<->pandas per-element conversion.
# The blob bytes are exactly the per-doc segment encoding, so the reducer
# only concatenates them.
POSTINGS_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("docId", LongType(), False),
        StructField("tf", IntegerType(), False),
        StructField("dl", IntegerType(), False),
        StructField("posbin", BinaryType(), True),
    ]
)

SEGMENT_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("salt", IntegerType(), False),
        StructField("min_docid", LongType(), False),
        StructField("ndocs", IntegerType(), False),
        StructField("sum_tf", LongType(), False),
        StructField("max_tf", IntegerType(), False),
        StructField("docids", BinaryType(), False),
        StructField("tfs", BinaryType(), False),
        StructField("dls", BinaryType(), False),
        StructField("poslens", BinaryType(), True),
        StructField("positions", BinaryType(), True),
        StructField("block_last_docid", ArrayType(LongType()), False),
        StructField("block_max_tf", ArrayType(IntegerType()), False),
        # byte offsets of each block inside docids/tfs/dls — the delta chain
        # restarts at every block, so a block is independently decodable
        # (block-max WAND skips whole blocks without touching their bytes)
        StructField("block_docid_off", ArrayType(IntegerType()), False),
        StructField("block_tf_off", ArrayType(IntegerType()), False),
        StructField("block_dl_off", ArrayType(IntegerType()), False),
    ]
)

BLOCK_SIZE = 128  # postings per block-max block (Ding & Suel, SIGIR'11)


def _batch_postings(pdf: pd.DataFrame, fn):
    """Tokenize one Arrow batch into posting-level flat arrays.

    Returns (terms_obj, docid, tf, dl, posbuf, bbound) — one entry per
    (doc, term) group; ``posbuf`` is the batch's position blobs concatenated
    (per-posting delta chains), ``bbound`` the per-posting byte offsets.
    Flat token stream + one factorize + lexsort + run-length pass — no
    pandas explode / groupby.agg (object-heavy allocations anti-scale under
    many concurrent workers: measured 4.8x slower, memory-bandwidth-bound).
    """
    toks_list = [fn(t) if t else [] for t in pdf["content"].values]
    dl = np.fromiter((len(t) for t in toks_list), dtype=np.int64, count=len(toks_list))
    total = int(dl.sum())
    if total == 0:
        return None
    flat = np.empty(total, dtype=object)
    off = 0
    for t in toks_list:
        flat[off : off + len(t)] = t
        off += len(t)
    doc_idx = np.repeat(np.arange(len(toks_list)), dl)
    starts = np.zeros(len(toks_list) + 1, dtype=np.int64)
    starts[1:] = np.cumsum(dl)
    pos = (np.arange(total) - starts[doc_idx]).astype(np.int32)
    codes, uniques = pd.factorize(pd.Series(flat), sort=False)
    order = np.lexsort((codes, doc_idx))
    d_s, c_s, p_s = doc_idx[order], codes[order], pos[order]
    newgrp = np.empty(total, dtype=bool)
    newgrp[0] = True
    newgrp[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
    gstart = np.flatnonzero(newgrp)
    tf = np.diff(np.append(gstart, total)).astype(np.int64)
    # positions (sorted within group: lexsort is stable) -> one vectorized
    # delta+varbyte pass, chain restarting per posting
    deltas = p_s.astype(np.int64)
    deltas[1:] -= p_s[:-1]
    deltas[gstart] = p_s[gstart]
    posbuf = varbyte_encode(deltas)
    blens = _byte_lens(deltas)
    bbound = np.zeros(len(gstart) + 1, dtype=np.int64)
    np.cumsum(np.add.reduceat(blens, gstart), out=bbound[1:])
    return (
        uniques[c_s[gstart]],
        pdf["docId"].values[d_s[gstart]].astype(np.int64),
        tf,
        dl[d_s[gstart]],
        posbuf,
        bbound,
    )


def build_postings(
    corpus: DataFrame, analyzer: str = "porter", term_prefix: str = ""
) -> DataFrame:
    """B1 (+A9): corpus -> (term, docId, tf, dl, posbin) posting rows.

    Row-level output — the query/oracle surface. The segment BUILD path uses
    :func:`build_miniblocks` (map-side combine) instead.

    ``term_prefix`` namespaces every emitted term (fielded indexing: the
    ``path:`` / ``lang:`` Lucene-field shape) — applied AFTER analysis so
    the analyzer never sees or mangles the prefix.
    """

    def kernel(batches):
        fn = get_analyzer(analyzer)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = _batch_postings(pdf, fn)
            if out is None:
                continue
            terms, docid, tf, dl, posbuf, bbound = out
            if term_prefix:
                terms = (term_prefix + pd.Series(terms, dtype=object)).values
            yield pd.DataFrame(
                {
                    "term": terms,
                    "docId": docid,
                    "tf": tf.astype("int32"),
                    "dl": dl.astype("int32"),
                    "posbin": [
                        posbuf[bbound[k] : bbound[k + 1]] for k in range(len(terms))
                    ],
                }
            )

    from ._parallel import ensure_parallelism

    src = ensure_parallelism(corpus.select("docId", "content"))
    return src.mapInPandas(kernel, POSTINGS_SCHEMA)


def heavy_terms(postings: DataFrame, threshold: int) -> list[str]:
    """Skew detection: terms whose df exceeds `threshold`. Returned list is
    small (code keywords / stopword-like terms) and is broadcast."""
    rows = (
        postings.groupBy("term")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > threshold)
        .select("term")
        .collect()
    )
    return sorted(r[0] for r in rows)


def heavy_terms_sampled(
    corpus: DataFrame, analyzer: str, threshold: int, sample_mod: int = 64
) -> list[str]:
    """Skew detection on a deterministic 1/sample_mod docId slice.

    Heavy terms are by definition massively frequent, so a hash slice finds
    them reliably; tokenizing the full corpus twice (or persisting raw
    postings) just for df stats would dominate the build at scale. The slice
    is a pure function of docId — partition- and resume-independent.
    """
    if sample_mod <= 1:
        return heavy_terms(build_postings(corpus, analyzer), threshold)
    sub = corpus.where(F.pmod(F.xxhash64("docId"), F.lit(sample_mod)) == 0)
    return heavy_terms(
        build_postings(sub, analyzer), max(1, threshold // sample_mod)
    )


def salted(postings: DataFrame, heavy: list[str], n_salts: int) -> DataFrame:
    """term -> (term, salt): heavy terms fan out over `n_salts` deterministic
    salts (pure function of docId — resume-safe); light terms salt=0."""
    if not heavy or n_salts <= 1:
        return postings.withColumn("salt", F.lit(0))
    is_heavy = isin_expr("term", heavy)
    return postings.withColumn(
        "salt",
        F.when(is_heavy, (F.pmod(F.col("docId"), F.lit(n_salts))).cast("int")).otherwise(
            F.lit(0)
        ),
    )


def _byte_lens(values: np.ndarray) -> np.ndarray:
    """Varbyte byte-length per value (same thresholds as the encoder)."""
    lens = np.ones(len(values), dtype=np.int64)
    if len(values) == 0:
        return lens
    mx = int(values.max())
    for k in range(1, 9):
        if mx < (1 << (7 * k)):
            break
        lens += values >= (np.int64(1) << (7 * k))
    return lens


def _block_encoded(values: np.ndarray, bstarts: np.ndarray, delta: bool) -> tuple[bytes, list]:
    """Encode `values` varbyte with the delta chain restarting at each block
    start; returns (bytes, per-block byte offsets)."""
    if delta:
        d = values.copy()
        d[1:] -= values[:-1]
        d[bstarts] = values[bstarts]
    else:
        d = values
    buf = varbyte_encode(d)
    blens = _byte_lens(d)
    cum = np.zeros(len(d) + 1, dtype=np.int64)
    cum[1:] = np.cumsum(blens)
    return buf, [int(cum[s]) for s in bstarts]


def _pa_types():
    import pyarrow as pa

    return {
        "term": pa.string(),
        "salt": pa.int32(),
        "min_docid": pa.int64(),
        "ndocs": pa.int32(),
        "sum_tf": pa.int64(),
        "max_tf": pa.int32(),
        "docids": pa.binary(),
        "tfs": pa.binary(),
        "dls": pa.binary(),
        "poslens": pa.binary(),
        "positions": pa.binary(),
        "block_last_docid": pa.list_(pa.int64()),
        "block_max_tf": pa.list_(pa.int32()),
        "block_docid_off": pa.list_(pa.int32()),
        "block_tf_off": pa.list_(pa.int32()),
        "block_dl_off": pa.list_(pa.int32()),
    }


def _binary_offsets(arr) -> tuple[np.ndarray, np.ndarray]:
    """(offsets, data) of an Arrow (Large)Binary/(Large)String array as numpy
    — zero-copy views into the Arrow buffers, honoring the array's slice
    offset. Large types carry int64 offsets (the >2 GiB-per-partition case —
    see :func:`_combine_large`)."""
    import pyarrow as pa

    buffers = arr.buffers()
    wide = pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type)
    dt = np.int64 if wide else np.int32
    offs = np.frombuffer(buffers[1], dtype=dt)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    return offs.astype(np.int64), data


def _combine_large(batch_list):
    """Combine input Arrow batches into ONE chunk per column safely.

    ``combine_chunks`` on 32-bit-offset binary/string columns overflows
    (ArrowInvalid) once a reduce partition's concatenated payload exceeds
    2 GiB — exactly the regime large builds hit. Cast every binary/string
    column to its large_* (64-bit-offset) type BEFORE combining; downstream
    numpy code reads offsets via :func:`_binary_offsets` either way.
    """
    import pyarrow as pa

    tbl = pa.Table.from_batches(batch_list)
    fields = [
        pa.field(
            f.name,
            pa.large_binary()
            if pa.types.is_binary(f.type)
            else pa.large_string()
            if pa.types.is_string(f.type)
            else f.type,
        )
        for f in tbl.schema
    ]
    return tbl.cast(pa.schema(fields)).combine_chunks()


def _gather_bytes(data: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate data[starts[i]:starts[i]+lens[i]] for all i, vectorized.
    Returns (gathered bytes, output offsets of each piece)."""
    out_offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_offs[1:])
    total = int(out_offs[-1])
    idx = np.repeat(starts - out_offs[:-1], lens) + np.arange(total, dtype=np.int64)
    return data[idx], out_offs


def _segment_encoder(batches):
    """S8 kernel (``mapInArrow``): whole-partition Arrow-native encoder.

    Works directly on Arrow buffers — no pandas rows, no per-row Python
    objects (the Arrow->pandas conversion of term strings and posbin blobs
    dominated the reduce stage and anti-scaled under concurrent workers):

    - terms: dictionary-encode -> integer codes; lexicographic rank computed
      on the (tiny) dictionary only;
    - sort: numpy lexsort on (docId, salt, term-rank) — replaces the JVM
      ``sortWithinPartitions`` entirely;
    - posbin: per-group concatenation is a vectorized byte-gather from the
      Arrow data buffer (no bytes objects materialize per row).

    Materializes one partition per worker; size segments (num_segments) so a
    partition's postings fit worker memory — at cluster scale that is the
    normal shuffle-partition sizing rule.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    batch_list = [b for b in batches if b.num_rows]
    if not batch_list:
        return
    tbl = _combine_large(batch_list)
    n = tbl.num_rows
    term_arr = tbl.column("term").chunk(0)
    salt = tbl.column("salt").chunk(0).to_numpy().astype(np.int64)
    docid = tbl.column("docId").chunk(0).to_numpy().astype(np.int64)
    tf = tbl.column("tf").chunk(0).to_numpy().astype(np.int64)
    dl = tbl.column("dl").chunk(0).to_numpy().astype(np.int64)
    pos_arr = tbl.column("posbin").chunk(0)
    has_pos = pos_arr.null_count < n

    de = pc.dictionary_encode(term_arr)
    codes = de.indices.to_numpy().astype(np.int64)
    vocab = de.dictionary.to_pylist()
    rank = np.empty(len(vocab), dtype=np.int64)
    rank[np.argsort(np.array(vocab, dtype=object), kind="stable")] = np.arange(len(vocab))
    key = rank[codes]

    order = np.lexsort((docid, salt, key))
    key_s, salt_s, docid_s = key[order], salt[order], docid[order]
    tf_s, dl_s, codes_s = tf[order], dl[order], codes[order]

    newgrp = np.empty(n, dtype=bool)
    newgrp[0] = True
    newgrp[1:] = (key_s[1:] != key_s[:-1]) | (salt_s[1:] != salt_s[:-1])
    gs = np.flatnonzero(newgrp)
    ge = np.append(gs[1:], n)

    if has_pos:
        p_offs, p_data = _binary_offsets(pos_arr)
        starts_s = p_offs[:-1][order]
        lens_s = (p_offs[1:] - p_offs[:-1])[order]
    else:
        starts_s = lens_s = None
    yield from _pack_sorted(
        vocab, codes_s, salt_s, docid_s, tf_s, dl_s,
        (p_data if has_pos else None), starts_s, lens_s, gs, ge,
    )


# flush a packed output batch once its binary payload reaches this size —
# keeps every emitted RecordBatch far below the 2 GiB int32-offset ceiling
# of the (non-large) Arrow binary columns Spark expects back
_PACK_FLUSH_BYTES = 256 << 20


def _pack_sorted(vocab, codes_s, salt_s, docid_s, tf_s, dl_s,
                 pos_data, pos_starts_s, pos_lens_s, gs, ge):
    """Sorted posting-level flat arrays -> packed-segment RecordBatches
    (a generator: output is CHUNKED by payload bytes, never one giant batch).

    ``pos_data``: byte pool holding every posting's position blob;
    ``pos_starts_s``/``pos_lens_s``: per-posting (start, len) into it, in
    sorted row order. Per-group concat is a single vectorized byte-gather.

    ``tf_s``/``dl_s`` = None is MEMBERSHIP mode (trigram/substring indexes:
    tf==1 by construction, dl unused) — tf/dl blobs are stored EMPTY, which
    on a dense-id trigram index removes ~64% of payload bytes (measured,
    tools/index_size.py). Summary fields stay truthful under the tf=1
    reading: sum_tf=ndocs, max_tf=1, block_max_tf all 1.
    """
    import pyarrow as pa

    types = _pa_types()
    schema = pa.schema([pa.field(f.name, types[f.name]) for f in SEGMENT_SCHEMA.fields])
    has_pos = pos_data is not None
    if has_pos:
        gathered, out_offs = _gather_bytes(pos_data, pos_starts_s, pos_lens_s)
        gbytes = gathered.tobytes()
    out = {c.name: [] for c in SEGMENT_SCHEMA.fields}
    pend = 0
    for gi in range(len(gs)):
        s, e = int(gs[gi]), int(ge[gi])
        if has_pos:
            pos_bin = gbytes[int(out_offs[s]) : int(out_offs[e])]
            poslens_bin = varbyte_encode(pos_lens_s[s:e])
            pend += len(pos_bin) + len(poslens_bin)
        else:
            pos_bin = None
            poslens_bin = None
        packed = _encode_counts(
            docid_s[s:e],
            tf_s[s:e] if tf_s is not None else None,
            dl_s[s:e] if dl_s is not None else None,
        )
        out["term"].append(vocab[int(codes_s[s])])
        out["salt"].append(int(salt_s[s]))
        for name, val in zip(
            ("min_docid", "ndocs", "sum_tf", "max_tf", "docids", "tfs", "dls"),
            packed[:7],
        ):
            out[name].append(val)
        pend += len(packed[4]) + len(packed[5]) + len(packed[6])
        out["poslens"].append(poslens_bin)
        out["positions"].append(pos_bin)
        for name, val in zip(
            ("block_last_docid", "block_max_tf", "block_docid_off", "block_tf_off", "block_dl_off"),
            packed[7:],
        ):
            out[name].append(val)
        if pend >= _PACK_FLUSH_BYTES:
            yield pa.RecordBatch.from_pydict(out, schema=schema)
            out = {c.name: [] for c in SEGMENT_SCHEMA.fields}
            pend = 0
    if out["term"]:
        yield pa.RecordBatch.from_pydict(out, schema=schema)


def _encode_counts(
    docids: np.ndarray, tfs: np.ndarray | None, dls: np.ndarray | None
) -> tuple:
    """Block-encode the docid/tf/dl columns of one (term, salt) group.
    ``tfs``/``dls`` = None is membership mode: empty tf/dl blobs, all-zero
    block offsets, tf read as constant 1 (see ``_pack_sorted``)."""
    ndocs = len(docids)
    nblocks = (ndocs + BLOCK_SIZE - 1) // BLOCK_SIZE
    bstarts = np.arange(nblocks) * BLOCK_SIZE
    block_last = docids[np.minimum(bstarts + BLOCK_SIZE - 1, ndocs - 1)]
    docids_bin, docid_off = _block_encoded(docids, bstarts, delta=True)
    if tfs is None:
        zoff = [0] * nblocks
        return (
            int(docids[0]),
            int(ndocs),
            int(ndocs),  # sum_tf under the tf=1 reading
            1,
            docids_bin,
            b"",
            b"",
            block_last.tolist(),
            [1] * nblocks,
            docid_off,
            zoff,
            list(zoff),
        )
    block_max_tf = np.maximum.reduceat(tfs, bstarts) if ndocs else np.zeros(0)
    tfs_bin, tf_off = _block_encoded(tfs, bstarts, delta=False)
    dls_bin, dl_off = _block_encoded(dls, bstarts, delta=False)
    return (
        int(docids[0]),
        int(ndocs),
        int(tfs.sum()),
        int(tfs.max()),
        docids_bin,
        tfs_bin,
        dls_bin,
        block_last.tolist(),
        [int(x) for x in block_max_tf],
        docid_off,
        tf_off,
        dl_off,
    )


# ---------------------------------------------------------------------------
# map-side combine: the build shuffles packed per-term MINI-BLOCKS, not
# posting rows. Each map partition tokenizes its docs and emits one packed
# row per (term, salt): sorted docId deltas, tfs, dls, per-posting position
# blob lengths, concatenated position blobs. The shuffle then moves ~5-8x
# fewer, wider rows (the JVM row<->Arrow conversion cost is per-ROW), and the
# reducer merges mini-blocks fully vectorized. This is the classic partial
# aggregation / LSM shape for inverted-index builds.

MINIBLOCK_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("salt", IntegerType(), False),
        StructField("ndocs", IntegerType(), False),
        StructField("docids", BinaryType(), False),   # delta varbyte, restart/row
        StructField("tfs", BinaryType(), False),      # varbyte
        StructField("dls", BinaryType(), False),      # varbyte
        StructField("poslens", BinaryType(), True),   # varbyte per-posting blob len
        StructField("posbin", BinaryType(), True),    # concat per-posting blobs
    ]
)


def _slice_all(buf: bytes, gs: np.ndarray, ge: np.ndarray, bounds: np.ndarray):
    """Per-group byte slices of a whole-partition varbyte buffer, where
    ``bounds`` holds cumulative byte offsets per value."""
    return [buf[int(bounds[s]) : int(bounds[e])] for s, e in zip(gs, ge)]


def build_miniblocks(
    corpus: DataFrame,
    analyzer: str = "porter",
    heavy: list[str] | None = None,
    n_salts: int = 8,
    with_positions: bool = True,
    term_prefix: str = "",
    membership: bool = False,
) -> DataFrame:
    """Map-side combine kernel: corpus partition -> packed (term, salt)
    mini-blocks. Salting happens here (needs per-posting docId).

    ``term_prefix`` namespaces emitted terms post-analysis (fielded
    indexing). The prefix is constant per call, so it is applied to the
    factorized VOCAB (once per unique term, not per posting) and cannot
    change the sort/grouping order; ``heavy`` membership is checked on the
    UNPREFIXED analyzed token — skew detection stays field-local.

    ``membership`` emits EMPTY tf/dl blobs (trigram/substring indexes where
    tf==1 by construction): the shuffle then moves docid bytes only, and
    the merge encoder auto-detects the empties and packs membership rows
    (``_encode_counts`` with tfs=None)."""
    heavy_set = frozenset(heavy or [])
    do_salt = bool(heavy_set) and n_salts > 1

    def kernel(batches):
        fn = get_analyzer(analyzer)
        parts = []
        for pdf in batches:
            if len(pdf):
                out = _batch_postings(pdf, fn)
                if out is not None:
                    parts.append(out)
        if not parts:
            return
        terms = np.concatenate([p[0] for p in parts])
        docid = np.concatenate([p[1] for p in parts])
        tf = np.concatenate([p[2] for p in parts])
        dl = np.concatenate([p[3] for p in parts])
        # per-posting position blob (start, len) into one concatenated pool
        pool = b"".join(p[4] for p in parts)
        pstarts_parts, off = [], 0
        for p in parts:
            pstarts_parts.append(p[5][:-1] + off)
            off += int(p[5][-1])
        pstarts = np.concatenate(pstarts_parts)
        plens = np.concatenate([np.diff(p[5]) for p in parts])
        pos_data = np.frombuffer(pool, dtype=np.uint8)

        codes, uniques = pd.factorize(pd.Series(terms), sort=False)
        codes = codes.astype(np.int64)
        vocab = list(uniques)
        rank = np.empty(len(vocab), dtype=np.int64)
        rank[np.argsort(np.array(vocab, dtype=object), kind="stable")] = np.arange(len(vocab))
        key = rank[codes]
        if do_salt:
            hmask = np.fromiter((t in heavy_set for t in vocab), dtype=bool, count=len(vocab))
            salt = np.where(hmask[codes], docid % n_salts, 0).astype(np.int64)
        else:
            salt = np.zeros(len(codes), dtype=np.int64)
        order = np.lexsort((docid, salt, key))
        codes_s, salt_s = codes[order], salt[order]
        docid_s, tf_s, dl_s = docid[order], tf[order], dl[order]
        key_s = key[order]
        n = len(order)
        newgrp = np.empty(n, dtype=bool)
        newgrp[0] = True
        newgrp[1:] = (key_s[1:] != key_s[:-1]) | (salt_s[1:] != salt_s[:-1])
        gs = np.flatnonzero(newgrp)
        ge = np.append(gs[1:], n)

        # whole-partition encodes, sliced per group by byte offsets
        deltas = docid_s.copy()
        deltas[1:] -= docid_s[:-1]
        deltas[gs] = docid_s[gs]
        dbuf = varbyte_encode(deltas)
        dbounds = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(_byte_lens(deltas), out=dbounds[1:])
        out_vocab = [term_prefix + v for v in vocab] if term_prefix else vocab
        d = {
            "term": [out_vocab[int(codes_s[s])] for s in gs],
            "salt": salt_s[gs].astype("int32"),
            "ndocs": (ge - gs).astype("int32"),
            "docids": _slice_all(dbuf, gs, ge, dbounds),
        }
        if membership:
            d["tfs"] = [b""] * len(gs)
            d["dls"] = [b""] * len(gs)
        else:
            tbuf = varbyte_encode(tf_s)
            tbounds = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(_byte_lens(tf_s), out=tbounds[1:])
            lbuf = varbyte_encode(dl_s)
            lbounds = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(_byte_lens(dl_s), out=lbounds[1:])
            d["tfs"] = _slice_all(tbuf, gs, ge, tbounds)
            d["dls"] = _slice_all(lbuf, gs, ge, lbounds)
        if with_positions:
            plens_s = plens[order]
            pstarts_s = pstarts[order]
            gathered, out_offs = _gather_bytes(pos_data, pstarts_s, plens_s)
            gbytes = gathered.tobytes()
            pbuf = varbyte_encode(plens_s)
            pbounds = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(_byte_lens(plens_s), out=pbounds[1:])
            d["poslens"] = _slice_all(pbuf, gs, ge, pbounds)
            d["posbin"] = [
                gbytes[int(out_offs[s]) : int(out_offs[e])] for s, e in zip(gs, ge)
            ]
        else:
            d["poslens"] = [None] * len(gs)
            d["posbin"] = [None] * len(gs)
        yield pd.DataFrame(d)

    from ._parallel import ensure_parallelism

    src = ensure_parallelism(corpus.select("docId", "content"))
    return src.mapInPandas(kernel, MINIBLOCK_SCHEMA)


def _merge_encoder(batches):
    """Reduce kernel: (term, salt) mini-blocks -> packed segment rows.

    Fully vectorized: every mini-block column decodes in ONE varbyte pass
    over the Arrow data buffer (streams are self-delimiting; per-row delta
    restarts are undone with a cumsum base-correction), then the flat
    posting arrays feed the same lexsort + pack as the posting-level path.
    """
    yield from _merge_encoder_impl(batches, restarts_per_block=False)


def _compact_merge_encoder(batches):
    """Compaction reduce kernel: PACKED SEGMENT rows (delta chains restart
    every BLOCK_SIZE postings, not per row) -> merged packed segment rows.

    Same vectorized whole-buffer decode as :func:`_merge_encoder`; only the
    restart positions differ. This is B4/B5 at scale: the compaction
    shuffle moves packed rows (bytes), never per-posting rows, and the
    kernel never materializes Python objects per posting.
    """
    yield from _merge_encoder_impl(batches, restarts_per_block=True)


def _merge_encoder_impl(batches, restarts_per_block: bool):
    import pyarrow as pa
    import pyarrow.compute as pc

    batch_list = [b for b in batches if b.num_rows]
    if not batch_list:
        return
    tbl = _combine_large(batch_list)
    nrows = tbl.num_rows
    counts = tbl.column("ndocs").chunk(0).to_numpy().astype(np.int64)
    npost = int(counts.sum())
    row_of_post = np.repeat(np.arange(nrows), counts)
    vstarts = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(counts, out=vstarts[1:])

    def col_bytes(name):
        offs, data = _binary_offsets(tbl.column(name).chunk(0))
        return offs, data

    # docids: decode every row's delta stream in one pass, then undo the
    # chain restarts with a cumsum base-correction. Restarts sit at each row
    # start (mini-blocks) or additionally every BLOCK_SIZE postings within a
    # row (packed segment rows).
    d_offs, d_data = col_bytes("docids")
    deltas = varbyte_decode(d_data.tobytes(), int(d_offs[0]), int(d_offs[-1] - d_offs[0]))
    csum = np.cumsum(deltas)
    if restarts_per_block:
        nblocks = (counts + BLOCK_SIZE - 1) // BLOCK_SIZE
        rb_starts = np.zeros(nrows + 1, dtype=np.int64)
        np.cumsum(nblocks, out=rb_starts[1:])
        total_blocks = int(rb_starts[-1])
        # restart value-index of every block: row_start + 128 * (block # in row)
        block_row = np.repeat(np.arange(nrows), nblocks)
        within = np.arange(total_blocks) - rb_starts[block_row]
        restarts = vstarts[block_row] + within * BLOCK_SIZE
    else:
        restarts = vstarts[:-1]
    base_per = np.zeros(len(restarts), dtype=np.int64)
    base_per[1:] = csum[restarts[1:] - 1]
    seg_lens = np.diff(np.append(restarts, npost))
    docid = csum - np.repeat(base_per, seg_lens)
    t_offs, t_data = col_bytes("tfs")
    l_offs, l_data = col_bytes("dls")
    # membership rows (trigram/substring builds) carry EMPTY tf/dl blobs —
    # all-empty means skip the decode and repack membership; a mix of empty
    # and non-empty rows would silently misalign, so it is rejected
    membership = int(t_offs[-1] - t_offs[0]) == 0 and npost > 0
    if membership:
        if int(l_offs[-1] - l_offs[0]) != 0:
            raise ValueError("mixed membership/full tf-dl rows in one merge")
        tf = dl = None
    else:
        tf = varbyte_decode(
            t_data.tobytes(), int(t_offs[0]), int(t_offs[-1] - t_offs[0])
        )
        dl = varbyte_decode(
            l_data.tobytes(), int(l_offs[0]), int(l_offs[-1] - l_offs[0])
        )
        if len(tf) != npost:
            raise ValueError("mixed membership/full tf-dl rows in one merge")

    pos_col = tbl.column("positions" if restarts_per_block else "posbin").chunk(0)
    has_pos = pos_col.null_count < nrows
    if has_pos:
        pl_offs, pl_data = col_bytes("poslens")
        plens = varbyte_decode(
            pl_data.tobytes(), int(pl_offs[0]), int(pl_offs[-1] - pl_offs[0])
        )
        pb_offs, pb_data = _binary_offsets(pos_col)
        # per-posting start inside the posbin data pool: row start + within-row
        # running sum of blob lengths
        within = np.cumsum(plens) - plens
        row_base = within[vstarts[:-1]]
        pstarts = pb_offs[:-1][row_of_post] + (within - row_base[row_of_post])
    else:
        plens = pstarts = None
        pb_data = None

    term_arr = tbl.column("term").chunk(0)
    de = pc.dictionary_encode(term_arr)
    rcodes = de.indices.to_numpy().astype(np.int64)
    vocab = de.dictionary.to_pylist()
    rank = np.empty(len(vocab), dtype=np.int64)
    rank[np.argsort(np.array(vocab, dtype=object), kind="stable")] = np.arange(len(vocab))
    codes = rcodes[row_of_post]
    key = rank[codes]
    salt = tbl.column("salt").chunk(0).to_numpy().astype(np.int64)[row_of_post]

    order = np.lexsort((docid, salt, key))
    codes_s, salt_s = codes[order], salt[order]
    docid_s, key_s = docid[order], key[order]
    tf_s = tf[order] if tf is not None else None
    dl_s = dl[order] if dl is not None else None
    newgrp = np.empty(npost, dtype=bool)
    newgrp[0] = True
    newgrp[1:] = (key_s[1:] != key_s[:-1]) | (salt_s[1:] != salt_s[:-1])
    gs = np.flatnonzero(newgrp)
    ge = np.append(gs[1:], npost)
    yield from _pack_sorted(
        vocab, codes_s, salt_s, docid_s, tf_s, dl_s,
        (pb_data if has_pos else None),
        (pstarts[order] if has_pos else None),
        (plens[order] if has_pos else None),
        gs, ge,
    )


# Fielded-term separator: a C0 control char NO analyzer can emit from real
# text (':' is everywhere in source code — "std::vector", "key:value" — and
# naive/porter tokenizers keep it inside tokens, which would make content
# terms collide with field terms and corrupt per-field token accounting).
# Content containing U+001F is out of contract.
FIELD_SEP = "\x1f"


def build_segments_combined(
    corpus: DataFrame,
    analyzer: str,
    num_segments: int,
    heavy: list[str] | None = None,
    n_salts: int = 8,
    with_positions: bool = True,
    fields: dict[str, tuple[str, list[str]]] | None = None,
    membership: bool = False,
) -> DataFrame:
    """The build path: map-side combine -> one hash shuffle of mini-blocks ->
    vectorized merge into packed segments.

    ``fields`` maps extra corpus COLUMNS to ``(analyzer, heavy_terms)``:
    each is tokenized independently and emitted as ``<col><FIELD_SEP><token>`` terms
    (the Lucene fielded-index shape — ``path:util``, ``lang:python``). All
    field mini-blocks UNION BEFORE the single hash shuffle, so fielding adds
    zero extra shuffles; field dl is the FIELD's own token length, which is
    exactly what per-field BM25 wants. Field heavy lists matter at scale:
    a low-cardinality field term (``lang:en``) is the heaviest posting list
    in the index and must salt like any skewed content term."""
    mini = build_miniblocks(
        corpus.select("docId", "content"), analyzer, heavy, n_salts,
        with_positions, membership=membership,
    )
    for col, (fanalyzer, fheavy) in sorted((fields or {}).items()):
        fmini = build_miniblocks(
            corpus.select("docId", F.col(col).cast("string").alias("content")),
            fanalyzer,
            fheavy,
            n_salts,
            with_positions,
            term_prefix=f"{col}{FIELD_SEP}",
            membership=membership,
        )
        mini = mini.unionByName(fmini)
    mini = mini.repartition(num_segments, "term", "salt")
    packed = mini.mapInArrow(_merge_encoder, SEGMENT_SCHEMA)
    return packed.withColumn("seg", F.spark_partition_id())


def encode_segments(
    postings: DataFrame,
    num_segments: int,
    heavy: list[str] | None = None,
    n_salts: int = 8,
) -> DataFrame:
    """B2/B3 + S8: salted hash shuffle -> Arrow-native sort+pack kernel.

    Output carries ``seg = spark_partition_id`` — each partition IS a
    segment. HASH partitioning on (term, salt), not range: a range shuffle
    runs a separate RangePartitioner *sampling job* that recomputes the whole
    upstream tokenize pipeline, and Zipf term frequencies make sampled range
    bounds skew-prone anyway. With hash, each (term, salt) lands in exactly
    one partition and salting alone bounds the heaviest reducer. The
    in-partition (term, salt, docId) sort happens inside the Arrow kernel
    (numpy lexsort — cheaper than the JVM row sort and feeds the encoder
    zero-copy), so the files still come out term-sorted.

    Pruning tradeoff vs range partitioning (explicit): with hash, every
    segment file spans the full term alphabet, so `term IN (...)` pushdown
    skips ROW GROUPS inside each file (min/max stats on the sorted term
    column) but can no longer skip WHOLE FILES — a point query touches every
    segment file's footer. Measured impact on query latency is recorded in
    BENCH.md; the build-side win (no RangePartitioner sampling job that
    re-runs the tokenize pipeline) dominates at build scale.
    """
    p = salted(postings, heavy or [], n_salts)
    p = p.repartition(num_segments, "term", "salt")
    packed = p.mapInArrow(_segment_encoder, SEGMENT_SCHEMA)
    return packed.withColumn("seg", F.spark_partition_id())


def term_stats_from_segments(segments: DataFrame) -> DataFrame:
    """Q6-adjacent: (term, df, cf, max_tf) from packed rows — aggregates the
    tiny packed relation, never re-shuffles raw postings."""
    return segments.groupBy("term").agg(
        F.sum("ndocs").cast("long").alias("df"),
        F.sum("sum_tf").cast("long").alias("cf"),
        F.max("max_tf").alias("max_tf"),
    )
