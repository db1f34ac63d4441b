"""Independent UAX-29 word-boundary oracle: a direct per-character
implementation of the pairwise rules (WB4-WB13b), sharing NO code with the
engine's RE2-pass tokenizer (sentometrics_spark/scoring/tokenize.py).

Covers the character repertoire the engine targets (letters incl. accents
and non-Latin scripts, digits, marks, the mid/extend characters); Katakana
chains, regional indicators and Hebrew quote rules (WB7a-c) are out of
scope on both sides.
"""

import unicodedata

# the engine's mid repertoire (the common-web subset of the UAX-29 sets;
# fullwidth/Armenian/Arabic variants are out of scope on both sides)
MIDLETTER = {":", "\u00B7"}
MIDNUM = {",", ";"}
MIDNUMLET = {".", "\u2019"}
SQ = {"'"}


def wb_class(ch: str) -> str:
    if ch in SQ:
        return "SQ"
    if ch in MIDLETTER:
        return "ML"
    if ch in MIDNUM:
        return "MN"
    if ch in MIDNUMLET:
        return "MB"
    cat = unicodedata.category(ch)
    if cat == "Pc":  # underscore etc.
        return "EX"
    if cat == "Nd":
        return "NU"
    if cat in ("Mn", "Mc", "Me"):
        return "Extend"
    if cat.startswith("L"):
        return "LE"
    return "Other"


_MIDQ_LET = {"ML", "MB", "SQ"}  # (MidLetter | MidNumLetQ)
_MIDQ_NUM = {"MN", "MB", "SQ"}  # (MidNum | MidNumLetQ)


def _no_break(prev2: str | None, left: str, right: str, next2: str | None) -> bool:
    if left == "LE" and right == "LE":
        return True  # WB5
    if left == "LE" and right in _MIDQ_LET and next2 == "LE":
        return True  # WB6
    if left in _MIDQ_LET and right == "LE" and prev2 == "LE":
        return True  # WB7
    if left == "NU" and right == "NU":
        return True  # WB8
    if left == "LE" and right == "NU":
        return True  # WB9
    if left == "NU" and right == "LE":
        return True  # WB10
    if left in _MIDQ_NUM and right == "NU" and prev2 == "NU":
        return True  # WB11
    if left == "NU" and right in _MIDQ_NUM and next2 == "NU":
        return True  # WB12
    if left in ("LE", "NU", "EX") and right == "EX":
        return True  # WB13a
    if left == "EX" and right in ("LE", "NU"):
        return True  # WB13b
    return False


def uax29_word_tokens(text: str) -> list[str]:
    """Lowercase -> UAX-29 segments -> keep tokens containing a letter
    (= ICU skip_word_none + skip_word_number)."""
    text = text.lower()
    chars = list(text)
    if not chars:
        return []
    # WB4: Extend attaches to the previous char; drop from the pairing
    # sequence but remember which original char each effective char covers.
    eff_idx = [i for i, c in enumerate(chars) if wb_class(c) != "Extend" or i == 0]
    eff_cls = [wb_class(chars[i]) for i in eff_idx]
    breaks = [False] * len(chars)  # break BEFORE original index i
    for k in range(1, len(eff_idx)):
        prev2 = eff_cls[k - 2] if k >= 2 else None
        next2 = eff_cls[k + 1] if k + 1 < len(eff_cls) else None
        if not _no_break(prev2, eff_cls[k - 1], eff_cls[k], next2):
            breaks[eff_idx[k]] = True
    tokens: list[str] = []
    cur = chars[0]
    for i in range(1, len(chars)):
        if breaks[i]:
            tokens.append(cur)
            cur = chars[i]
        else:
            cur += chars[i]
    tokens.append(cur)

    def _kept(t: str) -> bool:
        # skip_word_none: needs a letter. skip_word_number: ICU tags the
        # token with the status of the rule matching its final transition —
        # WB9 (letter->digit) is LETTER {200}, WB8/11/12 (digit->digit,
        # digit-mid-digit) are NUMBER {100}. So drop a trailing digit
        # unless its effective predecessor (marks transparent) is a letter.
        if not any(unicodedata.category(c).startswith("L") for c in t):
            return False
        j = len(t) - 1
        while j >= 0 and unicodedata.category(t[j]) in ("Mn", "Mc", "Me"):
            j -= 1
        if j < 0 or unicodedata.category(t[j]) != "Nd":
            return True
        j -= 1
        while j >= 0 and unicodedata.category(t[j]) in ("Mn", "Mc", "Me"):
            j -= 1
        return j >= 0 and unicodedata.category(t[j]).startswith("L")

    return [t for t in tokens if _kept(t)]
