"""Porter stemmer — the original 1980 algorithm with the two documented
departures of Martin Porter's ANSI-C release, exactly as Lucene's
PorterStemFilter applies it (reference: the `text_en` field type chain
StandardTokenizer -> StopFilter -> LowerCaseFilter -> EnglishPossessiveFilter
-> PorterStemFilter, solr/server/solr/configsets/_default/conf/
managed-schema.xml:320-340; stemmer itself
lucene/analysis/common/src/java/org/apache/lucene/analysis/en/PorterStemmer.java,
a mechanical translation of the published C program).

Departures from the 1980 paper, as flagged in the C source and carried by
Lucene (both asserted by conformance vectors in tests/test_analyzer.py):

  * step 2: ``bli -> ble``   (the paper had ``abli -> able``)
  * step 2: ``logi -> log``  (absent from the paper)

Written from the published algorithm description — no reference code was
copied. The per-call cost is a handful of suffix probes over a <= 255-char
token; the batch analyzer amortizes it further by memoizing per unique token
(Zipf vocabularies repeat: a 10^12-turn corpus has billions of tokens but the
per-batch unique-term count is what this pays for).
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC){m}[V]: the number of V-to-C transitions."""
    m = 0
    i, n = 0, len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i == n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(stem: str) -> bool:
    return (len(stem) >= 2 and stem[-1] == stem[-2]
            and _is_cons(stem, len(stem) - 1))


def _cvc(stem: str) -> bool:
    """*o: stem ends consonant-vowel-consonant and the final consonant is not
    w, x or y."""
    if len(stem) < 3:
        return False
    n = len(stem)
    return (_is_cons(stem, n - 3) and not _is_cons(stem, n - 2)
            and _is_cons(stem, n - 1) and stem[-1] not in "wxy")


# (suffix, replacement, min_measure) rule tables for steps 2 and 3; within a
# step the FIRST suffix that matches (longest listed first per penultimate
# letter, as the algorithm keys rules) decides — match-then-test-m semantics:
# if the suffix matches but m fails, no other rule in the step is tried.
_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"),  # DEPARTURE: paper had abli -> able
    ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
    ("ization", "ize"), ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),  # DEPARTURE: absent from the paper
)
_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement", "ment",
    "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def _longest_match(word: str, suffixes) -> str | None:
    # simple linear scan — tables are tiny; pick the LONGEST matching suffix
    best, best_len = None, -1
    for entry in suffixes:
        suf = entry if isinstance(entry, str) else entry[0]
        if word.endswith(suf) and len(suf) > best_len:
            best, best_len = entry, len(suf)
    return best


def porter_stem(word: str) -> str:
    """Stem one lowercase token. Tokens of length <= 2 are returned as-is
    (the algorithm's k <= 1 guard)."""
    if len(word) <= 2:
        return word
    w = word

    # -- step 1a ------------------------------------------------------------
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # -- step 1b ------------------------------------------------------------
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        fired = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, fired = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, fired = w[:-3], True
        if fired:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w = w + "e"

    # -- step 1c ------------------------------------------------------------
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # -- step 2 -------------------------------------------------------------
    m2 = _longest_match(w, _STEP2)
    if m2 is not None:
        suf, rep = m2
        stem = w[: len(w) - len(suf)]
        if _measure(stem) > 0:
            w = stem + rep

    # -- step 3 -------------------------------------------------------------
    m3 = _longest_match(w, _STEP3)
    if m3 is not None:
        suf, rep = m3
        stem = w[: len(w) - len(suf)]
        if _measure(stem) > 0:
            w = stem + rep

    # -- step 4 -------------------------------------------------------------
    m4 = _longest_match(w, _STEP4)
    if m4 is not None:
        stem = w[: len(w) - len(m4)]
        if _measure(stem) > 1:
            if m4 == "ion":
                if stem and stem[-1] in "st":
                    w = stem
            else:
                w = stem

    # -- step 5a ------------------------------------------------------------
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # -- step 5b ------------------------------------------------------------
    if _ends_double_cons(w) and w[-1] == "l" and _measure(w) > 1:
        w = w[:-1]

    return w


@lru_cache(maxsize=1 << 20)
def porter_stem_cached(word: str) -> str:
    """Memoized stem — the batch-analyzer entry point. Zipf token streams hit
    this cache almost always; the bound caps worker memory at ~100 MB even on
    adversarial vocabularies."""
    return porter_stem(word)
