"""English Snowball (Porter2) stemmer — pure-Python implementation of the
published algorithm (M.F. Porter, snowballstem.org "English stemmer").

The reference stems every token before dictionary matching and context
counting (core/src/main/scala/org/dbpedia/spotlight/db/stem/
SnowballStemmer.scala:12-16 — lowercase, then Snowball EnglishStemmer).
This container has no snowball library, so the algorithm is implemented
from its public specification. It is applied identically at model-build
and query time, so matching is self-consistent even where this
implementation differs from the C Snowball on exotic words.
"""

from __future__ import annotations

VOWELS = set("aeiouy")
DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
LI_ENDING = set("cdeghkmnrt")

_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTIONS_1A = {
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
}


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in VOWELS


def _regions(word: str) -> tuple:
    """(R1 start, R2 start) per the spec; special prefixes gener/commun/arsen."""
    r1 = len(word)
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, len(word)):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = len(word)
    for i in range(r1 + 1, len(word)):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _short_syllable_at_end(word: str) -> bool:
    """Ends in a short syllable: (non-vowel, vowel, non-vowel≠wxY) or a
    two-letter (vowel, non-vowel) start."""
    n = len(word)
    if n >= 3:
        a, b, c = word[-3], word[-2], word[-1]
        if b in VOWELS and a not in VOWELS and c not in VOWELS and c not in "wxY":
            return True
    if n == 2 and word[0] in VOWELS and word[1] not in VOWELS:
        return True
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _short_syllable_at_end(word)


def _contains_vowel(s: str) -> bool:
    return any(ch in VOWELS for ch in s)


def porter2_stem(word: str) -> str:  # noqa: C901 — the spec is a step list
    word = word.lower()
    if len(word) <= 2:
        return word
    if word in _EXCEPTIONS:
        return _EXCEPTIONS[word]

    if word.startswith("'"):
        word = word[1:]
    # mark consonant-y
    if word.startswith("y"):
        word = "Y" + word[1:]
    word = "".join(
        "Y" if ch == "y" and word[i - 1] in VOWELS else ch
        for i, ch in enumerate(word)
    )

    r1, r2 = _regions(word)

    # Step 0
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s") and _contains_vowel(word[:-2]):
        word = word[:-1]

    if word in _EXCEPTIONS_1A:
        return word

    # Step 1b
    if word.endswith(("eedly", "eed")):
        suf = "eedly" if word.endswith("eedly") else "eed"
        if len(word) - len(suf) >= r1:
            word = word[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem = word[: -len(suf)]
                if _contains_vowel(stem):
                    word = stem
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(DOUBLES):
                        word = word[:-1]
                    elif _is_short(word, _regions(word)[0]):
                        word += "e"
                break
        r1, r2 = _regions(word)

    # Step 1c
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in VOWELS
    ):
        word = word[:-1] + "i"

    r1, r2 = _regions(word)

    # Step 2 (longest suffix, in R1)
    step2 = [
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"), ("ogi", "og"), ("li", ""),
    ]
    for suf, rep in step2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif suf == "li":
                    if len(word) > 2 and word[-3] in LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + rep
            break

    r1, r2 = _regions(word)

    # Step 3 (in R1; ative needs R2)
    step3 = [
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
        ("ical", "ic"), ("ness", ""), ("ful", ""),
    ]
    for suf, rep in step3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - len(suf) >= r2:
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)] + rep
            break

    r1, r2 = _regions(word)

    # Step 4 (in R2)
    step4 = [
        "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
        "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
    ]
    for suf in step4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    r1, r2 = _regions(word)

    # Step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _short_syllable_at_end(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("ll") and len(word) - 1 >= r2:
        word = word[:-1]

    return word.replace("Y", "y")
