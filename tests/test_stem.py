"""Porter2 stemmer: spec-documented examples + hand-traced vocabulary.

The expected values for the first three blocks are printed verbatim in
the algorithm description (snowballstem.org/algorithms/english/
stemmer.html): exceptional forms, post-1a invariants, and the step-1a
examples.  The vocabulary block was hand-traced through the spec and
cross-checked against published Porter2 behavior.
"""

import pytest

from auctus_spark.stem import stem

EXCEPTIONAL = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

POST_1A_INVARIANT = ["inning", "outing", "canning", "herring",
                     "earring", "proceed", "exceed", "succeed"]

STEP_1A = {
    "ties": "tie", "cries": "cri", "gas": "gas", "this": "this",
    "gaps": "gap", "kiwis": "kiwi",
}

VOCAB = {
    # 1b doubles / short-word e
    "running": "run", "betting": "bet", "hopping": "hop",
    "hoping": "hope", "meeting": "meet", "meetings": "meet",
    # ies / 1c
    "flies": "fli", "dies": "die", "cities": "citi", "crying": "cri",
    "happy": "happi", "say": "say", "by": "by",
    # step 2/3/4 chains
    "consistency": "consist", "consistence": "consist",
    "abilities": "abil", "ability": "abil",
    "electrical": "electr", "electricity": "electr",
    "communication": "communic", "generously": "generous",
    "happiness": "happi", "hopeful": "hope", "hopefulness": "hope",
    # gener-/commun-/arsen- R1 exceptions
    "generate": "generat", "generates": "generat",
    "generated": "generat", "generating": "generat",
    "general": "general", "generic": "generic",
    # longest-match-then-stop (no fallback to shorter suffix)
    "argument": "argument", "arguments": "argument",
    # misc stability
    "temperatures": "temperatur", "temperature": "temperatur",
    "conditional": "condit", "rational": "ration",
    "sensational": "sensat",
    # short words / non-alpha tokens untouched
    "be": "be", "is": "is", "a": "a", "x1": "x1",
    "foo_bar": "foo_bar", "v2": "v2", "42": "42",
}


@pytest.mark.parametrize("w,want", sorted(EXCEPTIONAL.items()))
def test_exceptional_forms(w, want):
    assert stem(w) == want


@pytest.mark.parametrize("w", POST_1A_INVARIANT)
def test_post_1a_invariants(w):
    assert stem(w) == w


@pytest.mark.parametrize("w,want", sorted(STEP_1A.items()))
def test_step_1a_examples(w, want):
    assert stem(w) == want


@pytest.mark.parametrize("w,want", sorted(VOCAB.items()))
def test_vocabulary(w, want):
    assert stem(w) == want


def test_never_grows_nonalpha_and_is_deterministic():
    """Porter2 is deliberately NOT idempotent (parse→pars→par), and the
    engine never double-stems: index terms and query terms are each
    stemmed exactly once from surface forms.  What the index does rely
    on: determinism and stability on non-alphabetic tokens."""
    from auctus_spark.corpus import generate_corpus
    from auctus_spark.analysis import tokenize
    pdf = generate_corpus(300, min_tokens=20, max_tokens=120,
                          vocab_size=1500)
    vocab = set()
    for t in pdf.content:
        vocab.update(tokenize(t))
    for w in vocab:
        assert stem(w) == stem(w)
        if not any(c.isalpha() for c in w):
            assert stem(w) == w
