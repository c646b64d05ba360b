"""Codec goldens (byte-exact) from Team3CompressorTest.java:26-101 +
roundtrip property tests."""

import numpy as np
import pytest

from search_engine_spark.functions.codec import (
    delta_varbyte_decode,
    delta_varbyte_encode,
    naive_decode,
    naive_encode,
    varbyte_decode,
    varbyte_encode,
)

GOLDENS = [
    ([1, 2, 3, 4, 5, 6], bytes([0x01] * 6)),
    (
        [128, 384, 896, 1920, 3968],
        bytes([0x81, 0x00, 0x82, 0x00, 0x84, 0x00, 0x88, 0x00, 0x90, 0x00]),
    ),
    ([2147483647], bytes([0x87, 0xFF, 0xFF, 0xFF, 0x7F])),
]


@pytest.mark.parametrize("ints,enc", GOLDENS)
def test_golden_encode(ints, enc):
    assert delta_varbyte_encode(ints) == enc


@pytest.mark.parametrize("ints,enc", GOLDENS)
def test_golden_decode(ints, enc):
    assert list(delta_varbyte_decode(enc)) == ints


def test_partial_decode():
    # Team3CompressorTest.java:81-101 — byte-offset partial decode restarts
    # the delta chain
    assert list(delta_varbyte_decode(bytes([0x01] * 6), 4, 2)) == [1, 2]
    assert list(
        delta_varbyte_decode(
            bytes([0x81, 0x00, 0x82, 0x00, 0x84, 0x00, 0x88, 0x00, 0x90, 0x00]), 4, 6
        )
    ) == [512, 1536, 3584]


def test_empty():
    assert delta_varbyte_encode([]) == b""
    assert list(delta_varbyte_decode(b"")) == []


def test_naive_codec():
    # NaiveCompressor.java:14-28 — 4-byte big-endian
    assert naive_encode([1, 256]) == bytes([0, 0, 0, 1, 0, 0, 1, 0])
    assert list(naive_decode(naive_encode([7, 8, 9]))) == [7, 8, 9]


def test_truncated_stream_raises():
    with pytest.raises(ValueError):
        varbyte_decode(bytes([0x81]))  # continuation bit with no terminator


def test_roundtrip_fuzz():
    rng = np.random.default_rng(42)
    for _ in range(100):
        v = np.unique(rng.integers(0, 1 << 40, size=int(rng.integers(1, 500))))
        assert (delta_varbyte_decode(delta_varbyte_encode(v)) == v).all()
        w = rng.integers(0, 1 << 28, size=int(rng.integers(1, 500)))
        assert (varbyte_decode(varbyte_encode(w)) == w).all()


def test_compression_ratio():
    """Team6IndexCompressionTest.java:106 analog: delta+varbyte output must
    be < 2/3 of the naive 4-byte encoding on a realistic posting list."""
    rng = np.random.default_rng(7)
    docids = np.unique(rng.integers(0, 1_000_000, size=20_000))
    assert len(delta_varbyte_encode(docids)) < len(naive_encode(docids)) * 2 / 3


def test_hypothesis_roundtrip():
    hyp = pytest.importorskip("hypothesis")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=(1 << 62) - 1), max_size=200))
    def roundtrip(xs):
        arr = np.unique(np.array(xs, dtype=np.int64)) if xs else np.array([], dtype=np.int64)
        assert list(delta_varbyte_decode(delta_varbyte_encode(arr))) == list(arr)
        assert list(varbyte_decode(varbyte_encode(np.array(xs, dtype=np.int64)))) == xs

    roundtrip()
