"""Porter2 (Snowball English) stemmer — exact implementation of the published
algorithm (M.F. Porter, snowballstem.org "The English (Porter2) stemming
algorithm"), from the public spec, not a port of any library.

This is the snowball-exact mode the reference reaches through nltk's
SnowballStemmer (``Part C/stemmer.py:4-14``, ``Part A/parser_module.py:
219-227``). The repo's default opt-in ``stem`` analyzer stage
(``stemming.py``) remains the Catalyst-only approximation (whole-stage
codegen, SQL-oracle-twinned); ``porter2`` is the parity stage: identical
stems to Snowball English, vectorized through an Arrow pandas_udf (the
algorithm is genuinely iterative/stateful — out of reach for a Catalyst
expression tree — so this is the documented "UDF where built-ins can't
express the semantics" case). Golden-tested against the published spec
examples and the snowballstem.org sample vocabulary
(``tests/test_porter2.py``).

Scale shape: pure per-token string work, no state across rows — embeds in
the analyzer chain as a TEXT→TEXT Arrow batch transform, executor-parallel,
nothing on the driver.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_V = frozenset("aeiouy")  # marked 'Y' is a consonant by construction
_DOUBLE = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_END = frozenset("cdeghkmnrt")

# special word forms (spec: "If the word is one of the following, map or
# leave invariant")
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
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}
# invariant AFTER step 1a
_EXCEPTIONS_1A = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)

# step 2/3/4 suffix tables, ordered longest-first (Snowball takes the
# LONGEST matching suffix and applies its rule or nothing — never falls
# back to a shorter one)
_STEP2 = (
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"),
    ("tional", "tion"), ("biliti", "ble"), ("lessli", "less"),
    ("entli", "ent"), ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"), ("izer", "ize"),
    ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", "og"),
    ("li", ""),
)
_STEP3 = (
    ("ational", "ate"), ("tional", "tion"),
    ("alize", "al"), ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
    ("ical", "ic"), ("ness", ""),
    ("ful", ""),
)
_STEP4 = (
    "ement",
    "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
    "al", "er", "ic",
)


def _std_region(word: str, start: int) -> int:
    """Index after the first non-vowel that follows a vowel, scanning from
    ``start`` — the generic R1/R2 rule."""
    for i in range(start, len(word) - 1):
        if word[i] in _V and word[i + 1] not in _V:
            return i + 2
    return len(word)


def _regions(word: str) -> tuple[int, int]:
    if word.startswith(("gener", "arsen")):
        r1 = 5
    elif word.startswith("commun"):
        r1 = 6
    else:
        r1 = _std_region(word, 0)
    return r1, _std_region(word, r1)


def _ends_short_syllable(word: str) -> bool:
    """(a) non-vowel, vowel, non-vowel(≠ w/x/Y) at the end, or (b) the word
    is vowel+non-vowel (a 2-letter short syllable at the beginning)."""
    if len(word) == 2:
        return word[0] in _V and word[1] not in _V
    if len(word) >= 3:
        a, b, c = word[-3], word[-2], word[-1]
        return (
            b in _V and c not in _V and c not in "wxY" and a not in _V
        )
    return False


def stem_en(word: str) -> str:
    """Snowball English (Porter2) stem of a lowercase word."""
    word = word.lower()
    if word.startswith("'"):
        word = word[1:]
    if len(word) <= 2:
        return word
    hit = _EXCEPTIONS.get(word)
    if hit is not None:
        return hit

    # mark consonant-y: initial y, and y after a vowel
    if "y" in word:
        chars = list(word)
        if chars[0] == "y":
            chars[0] = "Y"
        for i in range(1, len(chars)):
            if chars[i] == "y" and chars[i - 1] in _V:
                chars[i] = "Y"
        word = "".join(chars)
    r1, r2 = _regions(word)

    # step 0: apostrophe suffixes
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        # delete if the part before the s contains a vowel NOT immediately
        # preceding it ("gas" keeps, "gaps"/"kiwis" drop)
        if any(ch in _V for ch in word[:-2]):
            word = word[:-1]
    if word in _EXCEPTIONS_1A:
        return word

    # step 1b — longest of (eedly, ingly, edly, eed, ing, ed)
    suf1b = next(
        (s for s in ("eedly", "ingly", "edly", "eed", "ing", "ed")
         if word.endswith(s)),
        None,
    )
    if suf1b in ("eed", "eedly"):
        if len(word) - len(suf1b) >= r1:
            word = word[: -len(suf1b)] + "ee"
    elif suf1b is not None:
        stem = word[: -len(suf1b)]
        if any(ch in _V for ch in stem):
            word = stem
            if word.endswith(("at", "bl", "iz")):
                word += "e"
            elif word.endswith(_DOUBLE):
                word = word[:-1]
            elif r1 >= len(word) and _ends_short_syllable(word):
                word += "e"  # the word is "short"

    # step 1c: y/Y → i after a non-vowel that is not the first letter
    if len(word) > 2 and word[-1] in "yY" and word[-2] not in _V:
        word = word[:-1] + "i"

    # step 2 (longest suffix; fires only if the match is in R1)
    for suf, rep in _STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif suf == "li":
                    if len(word) >= 3 and word[-3] in _LI_END:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + rep
            break

    # step 3 (in R1; 'ative' additionally requires R2)
    for suf, rep in _STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - 5 >= r2:
                        word = word[:-5]
                else:
                    word = word[: -len(suf)] + rep
            break

    # step 4 (delete in R2; 'ion' only after s/t)
    for suf in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) >= 4 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("ll") and len(word) - 1 >= r2:
        word = word[:-1]

    return word.replace("Y", "y")


def stem_tokens_en(tokens: list[str] | None) -> list[str] | None:
    if tokens is None:
        return None
    return [stem_en(t) if t is not None else None for t in tokens]


@F.pandas_udf(ArrayType(StringType()))
def porter2_tokens_udf(tokens: pd.Series) -> pd.Series:
    return tokens.map(stem_tokens_en)


@F.pandas_udf(StringType())
def porter2_term_udf(terms: pd.Series) -> pd.Series:
    return terms.map(lambda t: stem_en(t) if t is not None else None)


# Published golden vectors (spec exceptional forms + spec per-rule examples +
# snowballstem.org sample-vocabulary pairs). The driver's `porter2_stem`
# entry stems the LEFT column with this implementation and hash-compares
# against the RIGHT column served as a SQL VALUES oracle — non-circular:
# the expected stems are transcribed from the published algorithm page, not
# computed here. tests/test_porter2.py keeps an independent copy.
GOLDEN: tuple[tuple[str, str], ...] = (
    ("skis", "ski"), ("skies", "sky"), ("dying", "die"), ("lying", "lie"),
    ("tying", "tie"), ("idly", "idl"), ("gently", "gentl"), ("ugly", "ugli"),
    ("early", "earli"), ("only", "onli"), ("singly", "singl"),
    ("sky", "sky"), ("news", "news"), ("howe", "howe"), ("atlas", "atlas"),
    ("cosmos", "cosmos"), ("bias", "bias"), ("andes", "andes"),
    ("inning", "inning"), ("outing", "outing"), ("canning", "canning"),
    ("herring", "herring"), ("earring", "earring"), ("proceed", "proceed"),
    ("exceed", "exceed"), ("succeed", "succeed"),
    ("ties", "tie"), ("cries", "cri"), ("gas", "gas"), ("this", "this"),
    ("gaps", "gap"), ("kiwis", "kiwi"),
    ("agreed", "agre"), ("conflated", "conflat"), ("troubled", "troubl"),
    ("sized", "size"), ("hopping", "hop"), ("tanned", "tan"),
    ("falling", "fall"), ("hissing", "hiss"), ("fizzed", "fizz"),
    ("failing", "fail"), ("filing", "file"), ("hoping", "hope"),
    ("cry", "cri"), ("by", "by"), ("say", "say"),
    ("generate", "generat"), ("generates", "generat"),
    ("generated", "generat"), ("generating", "generat"),
    ("general", "general"), ("generally", "general"),
    ("generic", "generic"), ("generically", "generic"),
    ("generous", "generous"), ("generously", "generous"),
    ("rational", "ration"),
    ("consign", "consign"), ("consigned", "consign"),
    ("consigning", "consign"), ("consignment", "consign"),
    ("consist", "consist"), ("consisted", "consist"),
    ("consistency", "consist"), ("consistent", "consist"),
    ("consistently", "consist"), ("consisting", "consist"),
    ("consists", "consist"), ("consolation", "consol"),
    ("consolations", "consol"), ("consolatory", "consolatori"),
    ("console", "consol"), ("consoled", "consol"), ("consoles", "consol"),
    ("consolidate", "consolid"), ("consolidated", "consolid"),
    ("consolidating", "consolid"), ("consoling", "consol"),
    ("consols", "consol"), ("consonant", "conson"), ("consort", "consort"),
    ("consorted", "consort"), ("consorting", "consort"),
    ("conspicuous", "conspicu"), ("conspicuously", "conspicu"),
    ("conspiracy", "conspiraci"), ("conspirator", "conspir"),
    ("conspirators", "conspir"), ("conspire", "conspir"),
    ("conspired", "conspir"), ("conspiring", "conspir"),
    ("constable", "constabl"), ("constables", "constabl"),
    ("constance", "constanc"), ("constancy", "constanc"),
    ("constant", "constant"),
    ("knack", "knack"), ("knackeries", "knackeri"), ("knacks", "knack"),
    ("knag", "knag"), ("knave", "knave"), ("knaves", "knave"),
    ("knavish", "knavish"), ("kneaded", "knead"), ("kneading", "knead"),
    ("knee", "knee"), ("kneel", "kneel"), ("kneeled", "kneel"),
    ("kneeling", "kneel"), ("kneels", "kneel"), ("knees", "knee"),
    ("knell", "knell"), ("knelt", "knelt"), ("knew", "knew"),
    ("knife", "knife"), ("knight", "knight"), ("knightly", "knight"),
    ("knights", "knight"), ("knit", "knit"), ("knits", "knit"),
    ("knitted", "knit"), ("knitting", "knit"), ("knives", "knive"),
    ("knob", "knob"), ("knobs", "knob"), ("knock", "knock"),
    ("knocked", "knock"), ("knocker", "knocker"), ("knockers", "knocker"),
    ("knocking", "knock"), ("knocks", "knock"), ("knot", "knot"),
    ("knots", "knot"),
)


def porter2_text_udf():
    """TEXT→TEXT analyzer stage (tokenize + stem + rejoin, duplicate
    preserving) — the Arrow batch transform ``analyze_text_expr`` plugs in
    for the ``porter2`` stage. Built lazily so importing this module never
    needs an active SparkSession."""
    from .tokenizer import tokenize_py

    @F.pandas_udf(StringType())
    def _stage(text: pd.Series) -> pd.Series:
        return text.map(
            lambda t: (
                " ".join(stem_en(tok) for tok in tokenize_py(t))
                if t is not None
                else t
            )
        )

    return _stage
