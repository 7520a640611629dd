"""Property-based codec guarantees (hypothesis): the varbyte/delta/
block layer must round-trip ARBITRARY well-formed inputs, not just the
fixed fixtures — this is the layer every query result rests on."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from auctus_spark.index.build import _pack_partial_row, _varbyte_stream
from auctus_spark.index.codec import (
    BLOCK_SIZE,
    block_offsets,
    decode_blocks,
    delta_decode,
    delta_encode,
    varbyte_decode,
    varbyte_encode,
)

uints = st.lists(st.integers(min_value=0, max_value=(1 << 62) - 1),
                 min_size=1, max_size=500)


@settings(max_examples=200, deadline=None)
@given(uints)
def test_varbyte_roundtrip(vals):
    a = np.array(vals, dtype=np.int64)
    assert np.array_equal(varbyte_decode(varbyte_encode(a)), a)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 55)),
                min_size=1, max_size=600, unique=True))
def test_delta_roundtrip_sorted_ids(ids):
    a = np.sort(np.array(ids, dtype=np.int64))
    assert np.array_equal(delta_decode(delta_encode(a)), a)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 55)),
                min_size=1, max_size=600, unique=True),
       st.sets(st.integers(min_value=0, max_value=6), min_size=1))
def test_block_selective_decode_equals_full(ids, blocks):
    a = np.sort(np.array(ids, dtype=np.int64))
    deltas = delta_encode(a)
    blob = varbyte_encode(deltas)
    offs = block_offsets(deltas)
    n_blocks = len(offs) - 1
    sel = np.array(sorted(b for b in blocks if b < n_blocks),
                   dtype=np.int64)
    if sel.size == 0:
        return
    got, pos = decode_blocks(blob, offs, sel, deltas=True)
    want = np.concatenate([
        a[b * BLOCK_SIZE:(b + 1) * BLOCK_SIZE] for b in sel])
    assert np.array_equal(got, want)
    want_pos = np.concatenate([
        np.arange(b * BLOCK_SIZE,
                  min((b + 1) * BLOCK_SIZE, a.size)) for b in sel])
    assert np.array_equal(pos, want_pos)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 40)),
                min_size=1, max_size=400),
       st.data())
def test_varbyte_stream_matches_scalar_encoder(vals, data):
    """The build's width-adaptive grouped stream encoder must produce
    byte-identical output to the reference varbyte_encode per group."""
    a = np.array(vals, dtype=np.int64)
    n_groups = data.draw(st.integers(min_value=1,
                                     max_value=min(5, len(vals))))
    cuts = sorted(data.draw(st.sets(
        st.integers(min_value=1, max_value=len(vals) - 1),
        min_size=0, max_size=n_groups - 1))) if len(vals) > 1 else []
    group_starts = np.array([0, *cuts], dtype=np.int64)
    stream, g_off, g_end, pv = _varbyte_stream(a, group_starts)
    bounds = np.append(group_starts, len(vals))
    for i in range(len(group_starts)):
        seg = a[bounds[i]:bounds[i + 1]]
        want = varbyte_encode(seg)
        got = stream[g_off[i]:g_end[i]].tobytes()
        assert got == want
        assert np.array_equal(varbyte_decode(got), seg)


@settings(max_examples=50, deadline=None)
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=(1 << 40)),  # doc_id
              st.integers(min_value=1, max_value=50),         # tf
              st.integers(min_value=1, max_value=5000)),      # dl
    min_size=1, max_size=300, unique_by=lambda t: t[0]))
def test_pack_partial_row_roundtrip_with_positions(postings):
    """Compaction's single-partial re-encoder must produce rows the
    query-side decoders read back exactly (docs/tfs/dls and the
    per-posting position stream)."""
    postings.sort()
    ids = np.array([p[0] for p in postings], dtype=np.int64)
    tfs = np.array([p[1] for p in postings], dtype=np.int64)
    dls = np.array([p[2] for p in postings], dtype=np.int64)
    rng = np.random.RandomState(0)
    pos_groups = [np.sort(rng.choice(10_000, size=t, replace=False))
                  .astype(np.int64) for t in tfs]
    row = _pack_partial_row(ids, tfs, dls, pos_groups)
    assert np.array_equal(delta_decode(varbyte_decode(row["docs_blob"])),
                          ids)
    assert np.array_equal(varbyte_decode(row["tfs_blob"]), tfs)
    assert np.array_equal(varbyte_decode(row["dls_blob"]), dls)
    # positions: absolute reconstruction per posting
    pdl = varbyte_decode(row["pos_blob"])
    firsts = np.concatenate([[0], np.cumsum(tfs)])
    c = np.cumsum(pdl)
    prior = np.where(firsts[:-1] > 0, c[firsts[:-1] - 1], 0)
    absd = c - np.repeat(prior, tfs)
    flat_want = np.concatenate(pos_groups)
    assert np.array_equal(absd, flat_want)
    # per-block byte offsets select the right spans
    offs = np.frombuffer(row["pos_off"], dtype="<i4")
    blob = row["pos_blob"]
    n_blocks = len(offs) - 1
    for b in range(n_blocks):
        span = varbyte_decode(blob[offs[b]:offs[b + 1]])
        occ_lo = int(firsts[b * BLOCK_SIZE])
        occ_hi = int(firsts[min((b + 1) * BLOCK_SIZE, len(ids))])
        assert np.array_equal(span, pdl[occ_lo:occ_hi])
