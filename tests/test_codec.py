"""Posting codec: varbyte + block-reset delta round trips (SURVEY.md §5
rebuild plan item (c): golden posting-list contents / codec
round-trips)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from auctus_spark.index.codec import (
    BLOCK_SIZE,
    decode_segment,
    delta_decode,
    delta_encode,
    encode_segment,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_golden():
    # LEB128 golden bytes
    assert varbyte_encode(np.array([0])) == b"\x00"
    assert varbyte_encode(np.array([1])) == b"\x01"
    assert varbyte_encode(np.array([127])) == b"\x7f"
    assert varbyte_encode(np.array([128])) == b"\x80\x01"
    assert varbyte_encode(np.array([300])) == b"\xac\x02"
    assert varbyte_encode(np.array([])) == b""


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
@settings(max_examples=50, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


@given(st.sets(st.integers(min_value=0, max_value=10**12),
               min_size=1, max_size=1000))
@settings(max_examples=30, deadline=None)
def test_delta_block_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


def test_delta_resets_at_blocks():
    n = BLOCK_SIZE * 3 + 7
    ids = np.cumsum(np.ones(n, dtype=np.int64) * 5) + 1000
    d = delta_encode(ids)
    # block starts hold absolute ids → independently decodable blocks
    for s in range(0, n, BLOCK_SIZE):
        assert d[s] == ids[s]
    assert np.array_equal(delta_decode(d), ids)


def test_decode_blocks_selective():
    from auctus_spark.index.codec import decode_blocks
    rng = np.random.Generator(np.random.PCG64(9))
    n = BLOCK_SIZE * 5 + 17
    doc_ids = np.sort(rng.choice(10**7, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 9, n).astype(np.int64)
    dls = rng.integers(50, 500, n).astype(np.int64)
    seg = encode_segment(doc_ids, tfs, dls, avgdl=100.0)
    for blocks in ([0], [2, 4], [5], [0, 1, 2, 3, 4, 5]):
        bidx = np.array(blocks)
        ids, pos = decode_blocks(seg["docs_blob"], seg["docs_off"], bidx,
                                 deltas=True)
        t, _ = decode_blocks(seg["tfs_blob"], seg["tfs_off"], bidx)
        want_idx = np.concatenate(
            [np.arange(b * BLOCK_SIZE, min((b + 1) * BLOCK_SIZE, n))
             for b in blocks])
        assert np.array_equal(ids, doc_ids[want_idx])
        assert np.array_equal(t, tfs[want_idx])
        assert np.array_equal(pos, want_idx)
    # empty selection
    ids, pos = decode_blocks(seg["docs_blob"], seg["docs_off"],
                             np.array([], dtype=np.int64), deltas=True)
    assert ids.size == 0 and pos.size == 0


def test_segment_roundtrip_and_blockmax():
    rng = np.random.Generator(np.random.PCG64(5))
    n = 1000
    doc_ids = np.sort(rng.choice(10**9, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, n).astype(np.int64)
    dls = rng.integers(50, 5000, n).astype(np.int64)
    seg = encode_segment(doc_ids, tfs, dls, avgdl=700.0)
    got_ids, got_tfs, got_dls = decode_segment(
        seg["docs_blob"], seg["tfs_blob"], seg["dls_blob"])
    assert np.array_equal(got_ids, doc_ids)
    assert np.array_equal(got_tfs, tfs)
    assert np.array_equal(got_dls, dls)
    assert seg["n_docs"] == n
    assert len(seg["block_max"]) == (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    # block_max is a true upper bound of every posting's tf-norm
    norm = tfs / (tfs + 1.2 * (1 - 0.75 + 0.75 * dls / 700.0))
    for b, mx in enumerate(seg["block_max"]):
        blk = norm[b * BLOCK_SIZE:(b + 1) * BLOCK_SIZE]
        assert np.isclose(mx, blk.max())
    assert np.isclose(seg["max_norm"], norm.max())
