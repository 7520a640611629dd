"""Pure-Python reference scorer — the rank-identity contract.

Implements exactly what Elasticsearch 7.10.2 (Lucene 8.7) computes for
the query shape Auctus issues (``apiserver/apiserver/search/__init__.py:
57-109``): conjunctive AND over the analyzed terms, BM25 with k1=1.2 and
b=0.75 (``docker-compose.yml:4`` pins ES 7.10.2 → these defaults), top-k
= 50 (``apiserver/apiserver/search/base.py:1``), deterministic tie-break
(score desc, docID asc).

Lucene practical scoring (BM25Similarity since Lucene 8, no (k1+1)
numerator factor):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm(t,d) = tf / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q, d)  = sum_t idf(t) * tf_norm(t, d)

All math in float64.  N / df / avgdl are GLOBAL corpus statistics
computed before any pruning — the discipline the Spark engine must
mirror for rank identity (SURVEY.md §7 hard part 1).

This module deliberately has no Spark dependency: it is the pytest
oracle the distributed engine is graded against.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

from . import B, K1, TOP_K_SIZE
from .analysis import analyze_query, tokenize


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_tf_norm(tf: float, doc_len: float, avgdl: float,
                 k1: float = K1, b: float = B) -> float:
    return tf / (tf + k1 * (1.0 - b + b * doc_len / avgdl))


def lucene_sloppy_freq(pos_lists, slop: int,
                       terms: list[str] | None = None) -> float:
    """Lucene SloppyPhraseScorer.phraseFreq: ``pos_lists[i]`` is slot
    i's sorted OFFSET-ADJUSTED positions (token position − phrase
    offset).  A priority queue of per-slot cursors advances the
    minimum; every time the minimal window closes, ``1 / (1 +
    matchLength)`` accrues if the window width (= slop consumed) is
    within ``slop``.  Same algorithm runs in the oracle and inside
    the engine's bucket scorer, so scores are bit-identical by
    construction (float64 throughout — Lucene accumulates in float32;
    documented divergence).

    ``terms`` enables REPEATED phrase terms ("keep it simple simple"):
    slots sharing a term must match DISTINCT token positions, with
    offset-ordered displacement on collision (the lower-offset slot
    keeps the earlier position — see :func:`_sloppy_freq_repeats`).
    This rule guarantees exact-phrase hits remain sloppy hits and is
    the repo-wide contract (engine ≡ oracle bit-exact); real Lucene's
    repeat machinery (advanceRpts + bit matrices for synonym-sharing
    groups) can resolve exotic collision orders differently —
    documented divergence, as with float width.
    """
    if terms is not None and len(set(terms)) != len(terms):
        return _sloppy_freq_repeats(pos_lists, slop, terms)
    import heapq
    n = len(pos_lists)
    cursors = [0] * n
    heap = []
    end = None
    for off in range(n):
        pl = pos_lists[off]
        if len(pl) == 0:
            return 0.0
        p = int(pl[0])
        heap.append((p, off))
        if end is None or p > end:
            end = p
    heapq.heapify(heap)
    freq = 0.0
    pos, off = heapq.heappop(heap)
    match_length = end - pos
    nxt = heap[0][0] if heap else pos
    while True:
        cursors[off] += 1
        if cursors[off] >= len(pos_lists[off]):
            break
        pos = int(pos_lists[off][cursors[off]])
        if pos > end:
            end = pos
        if pos > nxt:
            if match_length <= slop:
                freq += 1.0 / (1.0 + match_length)
            heapq.heappush(heap, (pos, off))
            pos, off = heapq.heappop(heap)
            nxt = heap[0][0] if heap else pos
            match_length = end - pos
        else:
            ml2 = end - pos
            if ml2 < match_length:
                match_length = ml2
    if match_length <= slop:
        freq += 1.0 / (1.0 + match_length)
    return freq


def _sloppy_freq_repeats(pos_lists, slop: int,
                         terms: list[str]) -> float:
    """Repeats-aware sloppy freq (see :func:`lucene_sloppy_freq`).

    Same minimal-window accumulation as the base algorithm, plus the
    distinct-position rule with OFFSET-ORDERED displacement: when two
    same-term slots land on one token position, the lower-offset slot
    keeps the earlier position and the higher-offset slot advances
    (cascading).  Displacement — rather than the advancing slot
    skipping ahead — preserves the invariant that an exact phrase
    occurrence is always reachable as a zero-width window, so
    sloppy-hit docs are a superset of exact-hit docs (property-tested
    against the exact matcher).  Slot count is tiny, so min/end are
    recomputed per step instead of kept in a heap.  Clarity over
    speed — repeated-term phrases are rare."""
    n = len(pos_lists)
    plists = [[int(x) for x in p] for p in pos_lists]
    cur = [0] * n

    def absp(i):                      # absolute token position
        return plists[i][cur[i]] + i

    def adj(i):                       # offset-adjusted position
        return plists[i][cur[i]]

    def resolve(i):
        """Slot i just moved: displace higher-offset same-term slots
        off its position, cascading; False when a displacement
        exhausts a list (no further full match is possible)."""
        while True:
            hit = next((j for j in range(n)
                        if j != i and terms[j] == terms[i]
                        and absp(j) == absp(i)), None)
            if hit is None:
                return True
            loser = max(i, hit)       # lower offset keeps the spot
            cur[loser] += 1
            if cur[loser] >= len(plists[loser]):
                return False
            i = loser
    # init: place slots in offset order; collisions push the later
    # (higher-offset) slot forward — the canonical left-to-right
    # assignment
    for i in range(n):
        if not plists[i]:
            return 0.0
        if not resolve(i):
            return 0.0
    end = max(adj(i) for i in range(n))
    off = min(range(n), key=lambda i: (adj(i), i))
    match_length = end - adj(off)
    freq = 0.0
    while True:
        cur[off] += 1
        if cur[off] >= len(plists[off]) or not resolve(off):
            break
        end = max(end, max(adj(i) for i in range(n)))
        pos = adj(off)
        nxt = min(adj(j) for j in range(n) if j != off)
        if pos > nxt:
            if match_length <= slop:
                freq += 1.0 / (1.0 + match_length)
            off = min(range(n), key=lambda i: (adj(i), i))
            pos = adj(off)
            match_length = end - pos
        else:
            match_length = min(match_length, end - pos)
    if match_length <= slop:
        freq += 1.0 / (1.0 + match_length)
    return freq


@dataclass
class OracleIndex:
    """In-memory inverted index over (doc_id, text) pairs."""

    n_docs: int = 0
    avgdl: float = 0.0
    doc_len: dict[int, int] = field(default_factory=dict)
    postings: dict[str, dict[int, int]] = field(default_factory=dict)
    stem: bool = False

    @classmethod
    def build(cls, docs: list[tuple[int, str]],
              stem: bool = False) -> "OracleIndex":
        idx = cls(stem=stem)
        total = 0
        for doc_id, text in docs:
            toks = tokenize(text, stem=stem)
            idx.doc_len[doc_id] = len(toks)
            total += len(toks)
            for term, tf in Counter(toks).items():
                idx.postings.setdefault(term, {})[doc_id] = tf
        idx.n_docs = len(idx.doc_len)
        idx.avgdl = (total / idx.n_docs) if idx.n_docs else 0.0
        return idx

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def search(self, query: str, k: int = TOP_K_SIZE,
               k1: float = K1, b: float = B) -> list[tuple[int, float]]:
        """Conjunctive-AND BM25 top-k: [(doc_id, score)] sorted by
        (score desc, doc_id asc)."""
        terms = analyze_query(query, stem=self.stem)
        if not terms:
            return []
        plists = []
        for t in terms:
            p = self.postings.get(t)
            if not p:
                return []  # AND semantics: any missing term → no hits
            plists.append(p)
        # intersect docID sets
        candidates = set(plists[0])
        for p in plists[1:]:
            candidates &= set(p)
        scored: list[tuple[int, float]] = []
        for d in candidates:
            dl = self.doc_len[d]
            s = 0.0
            for t, p in zip(terms, plists):
                s += bm25_idf(self.n_docs, len(p)) * bm25_tf_norm(
                    p[d], dl, self.avgdl, k1, b)
            scored.append((d, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def search_prefix(self, prefix: str, k: int = TOP_K_SIZE,
                      boost: float = 1.0) -> list[tuple[int, float]]:
        """ES prefix query, constant_score rewrite: every doc with an
        index term starting with ``prefix`` scores ``boost``; doc_id
        order (see SearchEngine.search_prefix)."""
        p = prefix.lower().strip()
        if not p:
            return []
        docs = sorted({d for t, post in self.postings.items()
                       if t.startswith(p) for d in post})
        return [(d, float(boost)) for d in docs[:k]]

    def search_wildcard(self, pattern: str, k: int = TOP_K_SIZE,
                        boost: float = 1.0) -> list[tuple[int, float]]:
        """ES wildcard query, constant_score rewrite (see
        SearchEngine.search_wildcard)."""
        import re
        p = pattern.lower().strip()
        if not p:
            return []
        rx = re.compile("^" + "".join(
            ".*" if c == "*" else "." if c == "?" else re.escape(c)
            for c in p) + "$")
        docs = sorted({d for t, post in self.postings.items()
                       if rx.match(t) for d in post})
        return [(d, float(boost)) for d in docs[:k]]

    def search_regexp(self, pattern: str, k: int = TOP_K_SIZE,
                      boost: float = 1.0) -> list[tuple[int, float]]:
        """ES regexp query, constant_score rewrite (see
        SearchEngine.search_regexp): whole-term anchored regex over
        the term dictionary, matched verbatim (not analyzed)."""
        import re
        p = pattern.strip()
        if not p:
            return []
        rx = re.compile("^(?:" + p + ")$")
        docs = sorted({d for t, post in self.postings.items()
                       if rx.match(t) for d in post})
        return [(d, float(boost)) for d in docs[:k]]

    def search_or(self, query: str, k: int = TOP_K_SIZE,
                  k1: float = K1, b: float = B,
                  min_should_match: int = 1) -> list[tuple[int, float]]:
        """Disjunctive (should) BM25 top-k; docs matching fewer than
        ``min_should_match`` query terms are dropped (ES bool
        minimum_should_match).  Contributions sum in query-term order
        (bit-exact contract with the engine)."""
        terms = analyze_query(query, stem=self.stem)
        if not terms:
            return []
        plists = [(t, self.postings.get(t)) for t in terms]
        candidates: set[int] = set()
        for _, p in plists:
            if p:
                candidates |= set(p)
        scored: list[tuple[int, float]] = []
        for d in candidates:
            dl = self.doc_len[d]
            s, nt = 0.0, 0
            for t, p in plists:
                if p and d in p:
                    s += bm25_idf(self.n_docs, len(p)) * bm25_tf_norm(
                        p[d], dl, self.avgdl, k1, b)
                    nt += 1
            if nt >= min_should_match:
                scored.append((d, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    @classmethod
    def build_fields(cls, docs: list[tuple[int, dict[str, str]]]
                     ) -> dict[str, "OracleIndex"]:
        """Per-field indices (each field has its own N, df, avgdl —
        ES's per-field statistics model)."""
        fields: dict[str, list[tuple[int, str]]] = {}
        for doc_id, fvals in docs:
            for f, text in fvals.items():
                fields.setdefault(f, []).append((doc_id, text))
        return {f: cls.build(rows) for f, rows in fields.items()}


def search_multifield(field_indices: dict[str, "OracleIndex"],
                      query: str, boosts: dict[str, float],
                      k: int = TOP_K_SIZE) -> list[tuple[int, float]]:
    """Multi-field keyword search with field boosts — the reference's
    flagship query shape (``search/__init__.py:57-109``: multi_match
    over ``id^10, description, name^3, attribute_keywords`` with
    ``operator: and``).  Internalized as boosted sum of per-field BM25
    with term-centric AND: every query term must appear in at least
    one field of the doc; per-term contribution sums over the fields
    containing it (most_fields scoring, cross_fields AND semantics).

    Summation order (the bit-exact contract): for each term in query
    order, for each field in ``boosts`` order.
    """
    from .analysis import analyze_query
    terms = analyze_query(query)
    if not terms:
        return []
    # candidates: docs where every term appears in >= 1 field
    candidates: set[int] | None = None
    for t in terms:
        docs_t: set[int] = set()
        for f in boosts:
            idx = field_indices.get(f)
            if idx:
                docs_t |= set(idx.postings.get(t, {}))
        candidates = docs_t if candidates is None else candidates & docs_t
        if not candidates:
            return []
    scored = []
    for d in sorted(candidates):
        s = 0.0
        for t in terms:
            for f, boost in boosts.items():
                idx = field_indices.get(f)
                if not idx:
                    continue
                p = idx.postings.get(t, {})
                if d in p:
                    s += boost * bm25_idf(idx.n_docs, len(p)) * \
                        bm25_tf_norm(p[d], idx.doc_len[d], idx.avgdl)
        scored.append((d, s))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


def search_cross_fields(field_indices: dict[str, "OracleIndex"],
                        query: str, boosts: dict[str, float],
                        k: int = TOP_K_SIZE) -> list[tuple[int, float]]:
    """``multi_match type: cross_fields`` — the reference's flagship
    query TYPE (``search/__init__.py:64-76``).  Lucene BlendedTermQuery
    semantics (ES 7.10 MultiMatchQuery.blendTerms): per query term the
    document frequency is BLENDED across the field group —
    df_blend(t) = max over fields of df(t, f) — and each field scores
    the term with idf(N_f, min(df_blend, N_f)) (the clamp keeps idf
    positive where Lucene's unclamped blend can go negative when a
    small field's docCount < df_blend); the per-term score is the
    DisjunctionMax over fields with tie_breaker 0.0 (cross_fields
    default): max_f boost_f * idf_f * tf_norm_f.  AND across terms
    (every term in >= 1 field); per-term maxima summed in query order.
    """
    from .analysis import analyze_query
    terms = analyze_query(query)
    if not terms:
        return []
    candidates: set[int] | None = None
    for t in terms:
        docs_t: set[int] = set()
        for f in boosts:
            idx = field_indices.get(f)
            if idx:
                docs_t |= set(idx.postings.get(t, {}))
        candidates = docs_t if candidates is None else candidates & docs_t
        if not candidates:
            return []
    df_blend = {t: max((len(field_indices[f].postings.get(t, {}))
                        for f in boosts if f in field_indices),
                       default=0) for t in terms}
    scored = []
    for d in sorted(candidates):
        s = 0.0
        for t in terms:
            best = 0.0
            for f, boost in boosts.items():
                idx = field_indices.get(f)
                if not idx:
                    continue
                p = idx.postings.get(t, {})
                if d in p:
                    c = boost * bm25_idf(
                        idx.n_docs, min(df_blend[t], idx.n_docs)) * \
                        bm25_tf_norm(p[d], idx.doc_len[d], idx.avgdl)
                    if c > best:
                        best = c
            s += best
        scored.append((d, s))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


# ---------------------------------------------------------------------
# positional index + phrase search (beyond the reference's DSL: any
# ES-parity engine user expects match_phrase; Lucene PhraseQuery
# semantics — ES 7.x docs, Lucene ExactPhraseScorer)
# ---------------------------------------------------------------------


@dataclass
class PositionalOracleIndex:
    """In-memory positional index: postings[term][doc] = [positions]
    (positions = indices in the analyzed token sequence)."""

    n_docs: int = 0
    avgdl: float = 0.0
    doc_len: dict[int, int] = field(default_factory=dict)
    postings: dict[str, dict[int, list[int]]] = field(default_factory=dict)
    stem: bool = False

    @classmethod
    def build(cls, docs: list[tuple[int, str]],
              stem: bool = False) -> "PositionalOracleIndex":
        idx = cls(stem=stem)
        total = 0
        for doc_id, text in docs:
            toks = tokenize(text, stem=stem)
            idx.doc_len[doc_id] = len(toks)
            total += len(toks)
            for pos, term in enumerate(toks):
                idx.postings.setdefault(term, {}) \
                    .setdefault(doc_id, []).append(pos)
        idx.n_docs = len(idx.doc_len)
        idx.avgdl = (total / idx.n_docs) if idx.n_docs else 0.0
        return idx

    def search_span_first(self, term: str, end: int,
                          k: int = TOP_K_SIZE,
                          boost: float = 1.0) -> list[tuple[int, float]]:
        """span_first, constant_score rewrite (see
        PhraseEngine.search_span_first): term occurs at a position p
        with p + 1 <= end."""
        if end <= 0:
            return []
        toks = tokenize(term, stem=self.stem)
        if len(toks) != 1:
            raise ValueError("span_first takes exactly one term")
        post = self.postings.get(toks[0], {})
        docs = sorted(d for d, ps in post.items()
                      if any(p <= end - 1 for p in ps))
        return [(d, float(boost)) for d in docs[:k]]

    def search_span_near(self, clauses: list[str], slop: int = 0,
                         in_order: bool = True, k: int = TOP_K_SIZE,
                         boost: float = 1.0) -> list[tuple[int, float]]:
        """span_near, constant_score rewrite (see
        PhraseEngine.search_span_near) — independent brute-force
        matcher: a doc matches iff one position per clause exists
        with max+1-min-n <= slop (and strictly increasing in clause
        order when ``in_order``).  Enumeration is windowed (the span
        is at most slop+n tokens wide), so it stays exact AND cheap
        on high-tf terms."""
        toks = []
        for c in clauses:
            a = tokenize(c, stem=self.stem)
            if len(a) != 1:
                raise ValueError("span_near clauses take one term")
            toks.append(a[0])
        n = len(toks)
        plists = [self.postings.get(t) for t in toks]
        if any(p is None for p in plists):
            return []
        cand = set(plists[0])
        for p in plists[1:]:
            cand &= set(p)
        width = slop + n - 1  # max allowed (max - min)

        def match(pos: list[list[int]]) -> bool:
            if in_order:
                def rec(i: int, prev: int, p0: int) -> bool:
                    if i == n:
                        return True
                    return any(rec(i + 1, q, p0) for q in pos[i]
                               if q > prev and q <= p0 + width)
                return any(rec(1, p0, p0) for p0 in pos[0])
            starts = sorted({q for ps in pos for q in ps})
            return any(all(any(s <= q <= s + width for q in ps)
                           for ps in pos) for s in starts)

        docs = sorted(d for d in cand
                      if match([plists[i][d] for i in range(n)]))
        return [(d, float(boost)) for d in docs[:k]]

    def search_intervals(self, clauses: list, max_gaps: int = -1,
                         ordered: bool = True, k: int = TOP_K_SIZE,
                         boost: float = 1.0
                         ) -> list[tuple[int, float]]:
        """intervals (all_of over term / any_of clauses), constant_
        score rewrite (see PhraseEngine.search_intervals) —
        independent brute-force matcher: per clause the position set
        is the UNION of its terms' positions; a doc matches iff one
        position per clause exists with max+1-min-n <= max_gaps
        (unlimited when negative), strictly increasing when
        ``ordered``."""
        norm: list[list[str]] = []
        for c in clauses:
            terms = [c] if isinstance(c, str) else list(c)
            out = []
            for t in terms:
                a = tokenize(t, stem=self.stem)
                if len(a) != 1:
                    raise ValueError("intervals terms take one term")
                out.append(a[0])
            norm.append(out)
        n = len(norm)
        slop = max_gaps if max_gaps >= 0 else 1 << 30
        plists = []
        for c in norm:
            merged: dict[int, set] = {}
            for t in c:
                for d, ps in (self.postings.get(t) or {}).items():
                    merged.setdefault(d, set()).update(ps)
            if not merged:
                return []
            plists.append({d: sorted(ps) for d, ps in merged.items()})
        cand = set(plists[0])
        for p in plists[1:]:
            cand &= set(p)
        width = slop + n - 1

        def match(pos: list[list[int]]) -> bool:
            if ordered:
                def rec(i: int, prev: int, p0: int) -> bool:
                    if i == n:
                        return True
                    return any(rec(i + 1, q, p0) for q in pos[i]
                               if q > prev and q <= p0 + width)
                return any(rec(1, p0, p0) for p0 in pos[0])
            starts = sorted({q for ps in pos for q in ps})
            return any(all(any(s <= q <= s + width for q in ps)
                           for ps in pos) for s in starts)

        docs = sorted(d for d in cand
                      if match([plists[i][d] for i in range(n)]))
        return [(d, float(boost)) for d in docs[:k]]

    def search_span_not(self, include: str, exclude: str,
                        pre: int = 0, post: int = 0,
                        k: int = TOP_K_SIZE,
                        boost: float = 1.0) -> list[tuple[int, float]]:
        """span_not, constant_score rewrite (see
        PhraseEngine.search_span_not): an include position p with no
        exclude position in [p - pre, p + post]."""
        ti = tokenize(include, stem=self.stem)
        te = tokenize(exclude, stem=self.stem)
        if len(ti) != 1 or len(te) != 1:
            raise ValueError("span_not takes one include and one "
                             "exclude term")
        inc = self.postings.get(ti[0], {})
        exc = self.postings.get(te[0], {})
        docs = sorted(
            d for d, ps in inc.items()
            if any(all(not (p - pre <= q <= p + post)
                       for q in exc.get(d, []))
                   for p in ps))
        return [(d, float(boost)) for d in docs[:k]]

    def search_phrase(self, query: str, k: int = TOP_K_SIZE,
                      k1: float = K1, b: float = B, slop: int = 0
                      ) -> list[tuple[int, float]]:
        """Phrase top-k, Lucene PhraseQuery scoring: phrase_freq as the
        tf (exact adjacency count at slop=0; :func:`lucene_sloppy_freq`
        accumulation for slop>0), weight = SUM of the terms' idfs —
        score(d) = (sum_i idf(t_i)) * tf_norm(phrase_freq, dl, avgdl).
        Duplicate query terms are KEPT at slop=0 (order matters) AND
        at slop>0 (distinct-position repeats rule — see
        :func:`lucene_sloppy_freq`); idf_sum counts each phrase
        position like Lucene's PhraseWeight."""
        terms = [t for t in tokenize(query, stem=self.stem)]
        if not terms:
            return []
        plists = []
        for t in terms:
            p = self.postings.get(t)
            if not p:
                return []
            plists.append(p)
        candidates = set(plists[0])
        for p in plists[1:]:
            candidates &= set(p)
        idf_sum = 0.0
        for t in terms:
            idf_sum += bm25_idf(self.n_docs, len(self.postings[t]))
        scored: list[tuple[int, float]] = []
        for d in candidates:
            if slop:
                freq = lucene_sloppy_freq(
                    [[x - i for x in p[d]]
                     for i, p in enumerate(plists)], slop, terms=terms)
            else:
                occ = set(plists[0][d])
                for i, p in enumerate(plists[1:], start=1):
                    occ &= {x - i for x in p[d]}
                    if not occ:
                        break
                freq = len(occ)
            if not freq:
                continue
            s = idf_sum * bm25_tf_norm(freq, self.doc_len[d],
                                       self.avgdl, k1, b)
            scored.append((d, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]


def _search_phrase_prefix(self, query: str, k: int = TOP_K_SIZE,
                          max_expansions: int = 50
                          ) -> list[tuple[int, float]]:
    """ES match_phrase_prefix (see
    PhraseEngine.search_phrase_prefix): last token expands to the
    first ``max_expansions`` dictionary terms in term order; the last
    phrase slot is the union of the expansions' positions; idf_sum
    adds one SynonymQuery-style slot idf (max expansion df)."""
    terms = tokenize(query, stem=self.stem)
    if not terms:
        return []
    prefix, exact = terms[-1], terms[:-1]
    exp = sorted(t for t in self.postings
                 if t.startswith(prefix))[:max_expansions]
    if not exp:
        return []
    for t in exact:
        if t not in self.postings:
            return []
    slot_df = max(len(self.postings[t]) for t in exp)
    idf_sum = 0.0
    for t in exact:
        idf_sum += bm25_idf(self.n_docs, len(self.postings[t]))
    idf_sum += bm25_idf(self.n_docs, slot_df)
    n = len(terms)
    cands: set[int] | None = None
    for t in exact:
        cands = (set(self.postings[t]) if cands is None
                 else cands & set(self.postings[t]))
    exp_docs = {d for t in exp for d in self.postings[t]}
    cands = exp_docs if cands is None else cands & exp_docs
    scored: list[tuple[int, float]] = []
    for d in cands:
        occ: set[int] | None = None
        for i, t in enumerate(exact):
            pos_i = {x - i for x in self.postings[t].get(d, [])}
            occ = pos_i if occ is None else occ & pos_i
            if not occ:
                break
        last = {x - (n - 1) for t in exp
                for x in self.postings[t].get(d, [])}
        occ = last if occ is None else (occ & last if occ else occ)
        if not occ:
            continue
        freq = len(occ)
        s = idf_sum * bm25_tf_norm(freq, self.doc_len[d], self.avgdl)
        scored.append((d, s))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


PositionalOracleIndex.search_phrase_prefix = _search_phrase_prefix


def _analyze_slots(query: str, synonyms: dict, stem: bool = False
                   ) -> list[list[str]]:
    """Search-time synonym_graph analysis (reference applies the
    synonym filter on every search, elasticsearch.yml:16-24): each
    query token becomes a SLOT of alternatives [token, *synonyms],
    dedup'd, first-seen slot order.

    Chain order mirrors ES (coordinator/elasticsearch.yml:16-24):
    lowercase/tokenize → synonym lookup on the SURFACE form → stem each
    alternative exactly once.  Stemming before lookup would both miss
    synonym keys (the file maps surface forms) and double-stem the
    token (Porter2 is not idempotent: 'parses'→'pars'→'par')."""
    slots: list[list[str]] = []
    seen_slots: set[tuple] = set()
    for tok in tokenize(query):
        alts = [tok] + [s for s in synonyms.get(tok, []) if s != tok]
        if stem:
            from .stem import stem as _stem
            alts = list(dict.fromkeys(_stem(a) for a in alts))
        key = tuple(alts)
        if key not in seen_slots:
            seen_slots.add(key)
            slots.append(alts)
    return slots


def _search_synonyms(self, query: str, synonyms: dict,
                     k: int = TOP_K_SIZE, k1: float = K1, b: float = B
                     ) -> list[tuple[int, float]]:
    """Conjunctive search with synonym expansion — Lucene SynonymQuery
    semantics per slot: the alternatives act as ONE pseudo-term with
    tf = sum of member tfs and df = max of member dfs.  AND across
    slots."""
    slots = _analyze_slots(query, synonyms, stem=self.stem)
    if not slots:
        return []
    slot_plists = []
    for alts in slots:
        merged: dict[int, int] = {}
        df = 0
        for t in alts:
            p = self.postings.get(t, {})
            df = max(df, len(p))
            for d, tf in p.items():
                merged[d] = merged.get(d, 0) + tf
        if not merged:
            return []
        slot_plists.append((df, merged))
    candidates = set(slot_plists[0][1])
    for _, p in slot_plists[1:]:
        candidates &= set(p)
    scored: list[tuple[int, float]] = []
    for d in candidates:
        dl = self.doc_len[d]
        s = 0.0
        for df, p in slot_plists:
            s += bm25_idf(self.n_docs, df) * bm25_tf_norm(
                p[d], dl, self.avgdl, k1, b)
        scored.append((d, s))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


OracleIndex.search_synonyms = _search_synonyms


def _damerau_levenshtein(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein (adjacent transposition = 1
    edit, Lowrance-Wagner) — the DuckDB-shared definition.  Written
    INDEPENDENTLY of the engine's implementation (different matrix
    layout) so the rank-identity tests stay double-entry."""
    m, n = len(a), len(b)
    big = m + n + 1
    # rows indexed -1..m, cols -1..n (offset by 1)
    d = [[big] * (n + 2) for _ in range(m + 2)]
    for i in range(m + 1):
        d[i + 1][1] = i
    for j in range(n + 1):
        d[1][j + 1] = j
    last_a: dict[str, int] = {}
    for i in range(1, m + 1):
        last_b = 0
        for j in range(1, n + 1):
            i1 = last_a.get(b[j - 1], 0)
            j1 = last_b
            if a[i - 1] == b[j - 1]:
                sub = d[i][j]
                last_b = j
            else:
                sub = d[i][j] + 1
            d[i + 1][j + 1] = min(
                sub, d[i][j + 1] + 1, d[i + 1][j] + 1,
                d[i1][j1] + (i - i1 - 1) + (j - j1 - 1) + 1)
        last_a[a[i - 1]] = i
    return d[m + 1][n + 1]


def _search_fuzzy(self, term: str, k: int = TOP_K_SIZE,
                  fuzziness: int = 1, max_expansions: int = 50,
                  prefix_length: int = 0) -> list[tuple[int, float]]:
    """ES fuzzy query, simplified blended rewrite (see
    SearchEngine.search_fuzzy): dictionary expansion by Damerau-
    Levenshtein (transposition = 1 edit, ES parity), best
    ``max_expansions`` by (distance, df desc, term), scored as one
    SynonymQuery slot."""
    t = term.lower().strip()
    if not t:
        return []
    cands = []
    for w, post in self.postings.items():
        if prefix_length and not w.startswith(t[:prefix_length]):
            continue
        d = _damerau_levenshtein(w, t)
        if d <= fuzziness:
            cands.append((d, -len(post), w))
    cands.sort()
    exp = [w for _, _, w in cands[:max_expansions]]
    if not exp:
        return []
    merged: dict[int, int] = {}
    df = 0
    for w in exp:
        p = self.postings[w]
        df = max(df, len(p))
        for d_, tf in p.items():
            merged[d_] = merged.get(d_, 0) + tf
    idf = bm25_idf(self.n_docs, df)
    scored = [(d_, idf * bm25_tf_norm(tf, self.doc_len[d_],
                                      self.avgdl))
              for d_, tf in merged.items()]
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


OracleIndex.search_fuzzy = _search_fuzzy
