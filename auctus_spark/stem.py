"""Porter2 (Snowball English) stemmer — pure Python, no dependencies.

The reference stems every indexed field at index time: its ES analyzer
chain is ``standard tokenizer → lowercase → english stemmer``
(``coordinator/coordinator/elasticsearch.yml:6-15``).  This module is
the shared stemming contract for the index builder (applied to the
per-batch token VOCABULARY, never per occurrence), the query analyzer,
and the pure-Python oracle — all three call :func:`stem`, so rank
identity holds with stemming on.

Implemented from the published algorithm description
(snowballstem.org/algorithms/english/stemmer.html).  Tokens here are
``[a-z0-9_]+``; digits and ``_`` are treated as consonants (they never
match any suffix rule), matching Snowball's behavior of treating any
non-vowel character as a consonant.

Note: the sandbox has no snowballstemmer/NLTK/DuckDB-fts to diff
against, so the pytest suite pins the spec's own documented examples
(exceptional forms, step-1a examples, invariants) plus a hand-checked
vocabulary.
"""

from __future__ import annotations

import functools

_VOWELS = frozenset("aeiouy")          # after Y-marking, 'y' is a vowel
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTION2 = frozenset((
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
))

_STEP2 = (  # longest-match ordering handled by sort below
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", None), ("li", None),
)
_STEP3 = (
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", None),
    ("ical", "ic"), ("ness", ""), ("ful", ""),
)
_STEP4 = ("ement", "ance", "ence", "able", "ible", "ment",
          "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
          "ion", "al", "er", "ic")


def _mark_y(w: str) -> str:
    """Consonant-y marking: initial y and y after a vowel become Y."""
    if "y" not in w:
        return w
    out = list(w)
    if out[0] == "y":
        out[0] = "Y"
    for i in range(1, len(out)):
        if out[i] == "y" and out[i - 1] in _VOWELS:
            out[i] = "Y"
    return "".join(out)


def _find_r(w: str, start: int) -> int:
    """Position after the first non-vowel following a vowel, from
    ``start``; len(w) if none."""
    n = len(w)
    i = start
    while i < n and w[i] not in _VOWELS:
        i += 1
    while i < n and w[i] in _VOWELS:
        i += 1
    return min(i + 1, n) if i < n else n


def _regions(w: str) -> tuple[int, int]:
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            r1 = len(pre)
            break
    else:
        r1 = _find_r(w, 0)
    return r1, _find_r(w, r1)


def _ends_short_syllable(w: str) -> bool:
    n = len(w)
    if n >= 3:
        if (w[-1] not in _VOWELS and w[-1] not in "wxY"
                and w[-2] in _VOWELS and w[-3] not in _VOWELS):
            return True
        return False
    if n == 2:
        return w[0] in _VOWELS and w[1] not in _VOWELS
    return False


def _has_vowel(s: str) -> bool:
    return any(c in _VOWELS for c in s)


@functools.lru_cache(maxsize=1 << 18)
def stem(word: str) -> str:
    """Porter2 stem of an already-lowercased token."""
    if len(word) <= 2:
        return word
    exc = _EXCEPTION1.get(word)
    if exc is not None:
        return exc
    w = _mark_y(word)
    r1, r2 = _regions(w)

    # ---- step 1a -----------------------------------------------------
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-3] + ("i" if len(w) - 3 > 1 else "ie")
    elif w.endswith("ss") or w.endswith("us"):
        pass
    elif w.endswith("s"):
        if _has_vowel(w[:-2]):
            w = w[:-1]

    if w in _EXCEPTION2:
        return w

    # ---- step 1b -----------------------------------------------------
    for suf in ("eedly", "eed"):
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + "ee"
            break
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem_part = w[: -len(suf)]
                if _has_vowel(stem_part):
                    w = stem_part
                    if w[-2:] in ("at", "bl", "iz"):
                        w += "e"
                    elif w[-2:] in _DOUBLES:
                        w = w[:-1]
                    elif r1 >= len(w) and _ends_short_syllable(w):
                        w += "e"
                break

    # ---- step 1c -----------------------------------------------------
    if (len(w) > 2 and w[-1] in "yY" and w[-2] not in _VOWELS):
        w = w[:-1] + "i"

    # ---- step 2 (longest suffix, condition in R1) --------------------
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if w.endswith("logi"):
                        w = w[:-1]
                elif suf == "li":
                    if len(w) >= 3 and w[-3] in _LI_ENDING:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break

    # ---- step 3 ------------------------------------------------------
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - len(suf) >= r2:
                        w = w[: -len(suf)]
                else:
                    w = w[: -len(suf)] + rep
            break

    # ---- step 4 (in R2) ----------------------------------------------
    for suf in _STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) >= 4 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    # ---- step 5 ------------------------------------------------------
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (len(w) - 1 >= r1
                                and not _ends_short_syllable(w[:-1])):
            w = w[:-1]
    elif w.endswith("ll") and len(w) - 1 >= r2:
        w = w[:-1]

    return w.replace("Y", "y")


def stem_all(words) -> list[str]:
    """Stem an iterable of tokens (lru-cached per distinct word)."""
    return [stem(x) for x in words]
