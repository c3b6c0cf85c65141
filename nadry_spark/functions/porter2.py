"""Pure-Python Porter2 (Snowball "english") stemmer.

Re-implements the published Snowball english stemmer algorithm
(https://snowballstem.org/algorithms/english/stemmer.html) from the
public spec — the reference uses the Java snowball `englishStemmer`
(reference: search-engin/src/main/java/indexer/Tokenizer.java:55-69,
pom dep com.github.rholder:snowball-stemmer). No third-party stemmer
package exists in this environment, so this module is the single
source of truth, golden-tested in tests/test_porter2.py.

The implementation is deliberately dependency-free and allocation-light
so it can run inside Arrow-batched pandas UDFs on executors.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")  # capital Y marks consonant-y and is excluded
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

# Exceptional forms (spec table): stemmed directly.
_EXCEPTIONS = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    # invariants
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# Invariant past step 1a.
_EXCEPTIONS_1A = frozenset(
    ["inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed"]
)

_STEP2_SUFFIXES = (
    # (suffix, replacement, requires_l_before) sorted longest-first; "li" has
    # the valid-li-ending condition handled inline.
    ("ization", "ize"),
    ("ational", "ate"),
    ("fulness", "ful"),
    ("ousness", "ous"),
    ("iveness", "ive"),
    ("tional", "tion"),
    ("biliti", "ble"),
    ("lessli", "less"),
    ("entli", "ent"),
    ("ation", "ate"),
    ("alism", "al"),
    ("aliti", "al"),
    ("ousli", "ous"),
    ("iviti", "ive"),
    ("fulli", "ful"),
    ("enci", "ence"),
    ("anci", "ance"),
    ("abli", "able"),
    ("izer", "ize"),
    ("ator", "ate"),
    ("alli", "al"),
    ("bli", "ble"),
    ("ogi", "og"),   # only if preceded by l
    ("li", ""),      # only if preceded by a valid li-ending
)

_STEP3_SUFFIXES = (
    ("ational", "ate"),
    ("tional", "tion"),
    ("alize", "al"),
    ("icate", "ic"),
    ("iciti", "ic"),
    ("ative", ""),   # only if in R2
    ("ical", "ic"),
    ("ness", ""),
    ("ful", ""),
)

_STEP4_SUFFIXES = (
    "ement",
    "ance",
    "ence",
    "able",
    "ible",
    "ment",
    "ant",
    "ent",
    "ism",
    "ate",
    "iti",
    "ous",
    "ive",
    "ize",
    "ion",  # special: requires preceding s or t
    "al",
    "er",
    "ic",
)


def _mark_ys(word: str) -> str:
    """Set initial y, or y after a vowel, to Y (consonant marker)."""
    if "y" not in word:
        return word
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        # unmarked lowercase y still counts as a vowel for the next char
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    return "".join(chars)


def _r1_start(word: str) -> int:
    for prefix in ("gener", "commun", "arsen"):
        if word.startswith(prefix):
            return len(prefix)
    return _region_after_vc(word, 0)


def _region_after_vc(word: str, start: int) -> int:
    """Index after the first non-vowel that follows a vowel, from `start`."""
    n = len(word)
    i = start
    # find a vowel
    while i < n and word[i] not in _VOWELS:
        i += 1
    # find a non-vowel after it
    while i < n and word[i] in _VOWELS:
        i += 1
    return min(i + 1, n) if i < n else n


def _ends_in_short_syllable(word: str) -> bool:
    n = len(word)
    if n >= 3:
        if (
            word[-2] in _VOWELS
            and word[-1] not in _VOWELS
            and word[-1] not in "wxY"
            and word[-3] not in _VOWELS
        ):
            return True
    if n == 2 and word[0] in _VOWELS and word[1] not in _VOWELS:
        return True
    return False


def _contains_vowel(segment: str) -> bool:
    return any(c in _VOWELS for c in segment)


def stem(word: str) -> str:
    """Porter2-stem a single (expected lowercase) token."""
    if len(word) <= 2:
        return word
    if word.startswith("'"):
        word = word[1:]
        if len(word) <= 2:
            return word
    exc = _EXCEPTIONS.get(word)
    if exc is not None:
        return exc

    word = _mark_ys(word)
    r1 = _r1_start(word)
    r2 = _region_after_vc(word, r1)

    # --- Step 0: strip 's / s' / '
    if word.endswith("'s'"):
        word = word[:-3]
    elif word.endswith("'s"):
        word = word[:-2]
    elif word.endswith("'"):
        word = word[:-1]

    # --- Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ied") or word.endswith("ies"):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith("us") or word.endswith("ss"):
        pass
    elif word.endswith("s"):
        if _contains_vowel(word[:-2]):
            word = word[:-1]

    if word in _EXCEPTIONS_1A:
        return word

    # --- Step 1b
    suffix = None
    for s in ("eedly", "ingly", "edly", "eed", "ing", "ed"):
        if word.endswith(s):
            suffix = s
            break
    if suffix in ("eed", "eedly"):
        if len(word) - len(suffix) >= r1:
            word = word[: -len(suffix)] + "ee"
    elif suffix is not None:
        stem_part = word[: -len(suffix)]
        if _contains_vowel(stem_part):
            word = stem_part
            if word.endswith(("at", "bl", "iz")):
                word += "e"
            elif word.endswith(_DOUBLES):
                word = word[:-1]
            elif _ends_in_short_syllable(word) and r1 >= len(word):
                word += "e"

    # --- Step 1c: y/Y -> i when preceded by a non-vowel that isn't the first letter
    if len(word) > 2 and word[-1] in "yY" and word[-2] not in _VOWELS:
        word = word[:-1] + "i"

    # --- Step 2 (longest suffix; apply only if in R1)
    for s, repl in _STEP2_SUFFIXES:
        if word.endswith(s):
            if len(word) - len(s) >= r1:
                if s == "ogi":
                    if len(word) > 3 and word[-4] == "l":
                        word = word[:-3] + repl
                elif s == "li":
                    if len(word) > 2 and word[-3] in _LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[: -len(s)] + repl
            break

    # --- Step 3 (longest suffix; apply only if in R1; ative needs R2)
    for s, repl in _STEP3_SUFFIXES:
        if word.endswith(s):
            if len(word) - len(s) >= r1:
                if s == "ative":
                    if len(word) - len(s) >= r2:
                        word = word[:-5]
                else:
                    word = word[: -len(s)] + repl
            break

    # --- Step 4 (longest suffix; delete if in R2; ion needs preceding s/t)
    for s in _STEP4_SUFFIXES:
        if word.endswith(s):
            if len(word) - len(s) >= r2:
                if s == "ion":
                    if len(word) > 3 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(s)]
            break

    # --- Step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2:
            word = word[:-1]
        elif len(word) - 1 >= r1 and not _ends_in_short_syllable(word[:-1]):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) > 1 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")
