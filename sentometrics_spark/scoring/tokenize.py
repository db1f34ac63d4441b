"""UAX-29 word/sentence segmentation, vectorized.

The reference tokenizes with ICU boundary rules
(stri_split_boundaries(type="word", skip_word_none=TRUE,
skip_word_number=TRUE) and type="sentence",
/root/reference/R/sentiment_engines.R:13-30). This module reproduces those
semantics without ICU, as a chain of RE2 passes over Arrow buffers — no
Python string objects are materialized for corpus tokens, so the hot
scoring path stays C-side.

Approach (word breaks). UAX-29 keeps a *mid* character inside a word only
when flanked by the right kinds of word characters:

  MidLetter       : U+00B7 (·)      — letters on both sides        (WB6/7)
  MidNumLetQ  . ' U+2019 (’)        — letters both sides or digits
                                      both sides                   (WB6/7, WB11/12)
  MidNum      , ;                   — digits on both sides         (WB11/12)
  ExtendNumLet _                    — joins letters/digits freely  (WB13a/b)

plus WB5/8/9/10 (letters and digits chain) and WB4 (combining marks attach
— \\p{M} is treated as a word character). Instead of pairwise scanning, we
*space out every mid character whose context does not license it*, then
split once on the complement of the word-character class. Each pass is a
single RE2 global replace; runs of >= 2 mids are never word-internal
(WB999) and are removed first, which makes the remaining single-mid
contexts non-overlapping, so one pass per rule suffices.

Skips: ICU's skip_word_none drops tokens with no letter/digit, and
skip_word_number drops all-digit tokens — together: keep exactly the
tokens containing at least one letter (\\p{L}).

Documented divergences from ICU (all irrelevant to the lexicon path):
  - no dictionary segmentation for CJK/Thai (an ideograph run is one token;
    ICU splits per dictionary);
  - Katakana chaining, regional-indicator pairs and emoji ZWJ sequences
    are not special-cased (such tokens carry no lexicon words);
  - Hebrew-letter single/double-quote rules (WB7a-c) are folded into the
    general letter rules.

Sentence breaks follow UAX-29 SB-lite: break after [.!?] + closing
quotes/brackets + whitespace, EXCEPT a full stop followed by a lowercase
character (SB8: ATerm Close* Sp* x Lower -> no break). The reference's
", " -> " c_c " comma-marker rewrite happens at tokenize time, as in
tokenize_texts (/root/reference/R/sentiment_engines.R:18-27); "c_c"
survives word segmentation as one token via the ExtendNumLet join.
"""

from __future__ import annotations

import re

import pandas as pd

# mid characters that can be word-internal under some context
MID_ALL = ".:'·’,;"
_W = r"\p{L}\p{M}\p{N}_"  # word characters (marks attach per WB4)

# WB4 edge: a combining mark attaches to the PRECEDING character, whatever
# it is — a mark at string start or after a separator therefore never joins
# the following letter. Detach such orphan marks (run before the mid passes,
# and again after, since a killed mid can orphan the mark behind it).
_ORPHAN_MARKS = (f"(^|[^{_W}{re.escape(MID_ALL)}])\\p{{M}}+", r"\1 ")

# (pattern, replacement) RE2 passes: delete every mid whose context does
# not license it (replacement keeps the flanking characters). \p{M}* makes
# every check mark-transparent (a mark attaches to the char before it, so
# the effective flank of a mid is the next non-mark char; a deleted mid
# takes its attached marks with it).
_MID = f"[{MID_ALL}]"
_PASSES: tuple[tuple[str, str], ...] = (
    _ORPHAN_MARKS,
    # WB999: runs of mids (possibly mark-separated) are never word-internal
    (f"{_MID}(\\p{{M}}*{_MID})+", " "),
    # any mid needs a word character on BOTH sides (WB6/7/11/12 all do)
    (f"(^|[^{_W}]){_MID}\\p{{M}}*", r"\1 "),
    (f"{_MID}\\p{{M}}*($|[^{_W}])", r" \1"),
    # MidLetter (: ·) licenses letters only — kill against digits/_
    (r"([\p{N}_]\p{M}*)[:·]\p{M}*", r"\1 "),
    (r"[:·]\p{M}*([\p{N}_])", r" \1"),
    # MidNum (, ;) licenses digits only — kill against letters/_
    (r"([\p{L}_]\p{M}*)[,;]\p{M}*", r"\1 "),
    (r"[,;]\p{M}*([\p{L}_])", r" \1"),
    # MidNumLetQ (. ' ’) licenses same-kind letter/digit sides — kill mixed
    # pairs and any _ flank (ExtendNumLet never licenses a mid)
    (r"(\p{N}\p{M}*)['’.]\p{M}*(\p{L})", r"\1 \2"),
    (r"(\p{L}\p{M}*)['’.]\p{M}*(\p{N})", r"\1 \2"),
    (r"(_\p{M}*)['’.]\p{M}*", r"\1 "),
    (r"['’.]\p{M}*(_)", r" \1"),
    _ORPHAN_MARKS,
)

SPLIT_PATTERN = f"[^{_W}{re.escape('.')}:'·’,;]+"
HAS_LETTER = r"\p{L}"
# ICU's skip_word_number drops tokens whose RBBI *rule status* is NUMBER,
# and the status comes from the rule matching the FINAL transition of the
# token. In ICU's word rules WB9 (ALetter x Numeric) is tagged {200}
# (LETTER) while WB8 (Numeric x Numeric) and WB11/12 (Numeric mid Numeric)
# are {100} (NUMBER): a token ending in a single digit right after a letter
# ("today1", "qe2") stays LETTER and is KEPT, while one ending in >=2
# digits or mid+digit ("unemployed38", "ing255.72", "boggling20,000") is
# NUMBER and dropped. Verified against the reference package's golden word
# counts on usnews (inst/extdata/test_data.rda, 250/250). Combining marks
# are transparent (they attach to the char before them).
ENDS_NUMBER = r"(^|[^\p{L}\p{M}])\p{M}*\p{Nd}\p{M}*$"

# passes are needed only when a batch contains a mid char or a combining
# mark; plain [a-z0-9 ]-ish text takes the single-split fast path
_ANY_MID = f"[{MID_ALL}]|\\p{{M}}"
# tier-0: nothing but lowercase ASCII letters and spaces anywhere in the
# batch => a plain-space split is exactly equivalent to the full rules
# (empty tokens from space runs are dropped by the has-letter filter
# either way), and the RE2 class split (~5x the cost) is skipped
_NOT_SIMPLE = "[^a-z ]"


def tokenize_arrow(arr) -> tuple:
    """texts (pa.Array of string) -> (pa.ListArray of lowercase word
    tokens, needs_letter_filter). Tokens with no letter (pure numbers /
    leftovers) are NOT yet filtered — the flat consumers filter with
    HAS_LETTER (or just nonempty when needs_letter_filter is False) so
    document offsets stay vectorized. Entirely C-side (utf8_lower + RE2
    replaces + one split)."""
    import pyarrow.compute as pc

    low = pc.utf8_lower(arr)
    if not (pc.any(pc.match_substring_regex(low, _NOT_SIMPLE)).as_py() or False):
        # tier-0: tokens are pure [a-z]*, every nonempty token has a letter
        return pc.split_pattern(low, pattern=" "), False
    any_mid = pc.any(pc.match_substring_regex(low, _ANY_MID)).as_py()
    if any_mid:
        for pat, rep in _PASSES:
            low = pc.replace_substring_regex(low, pattern=pat, replacement=rep)
    return pc.split_pattern_regex(low, pattern=SPLIT_PATTERN), True


def _has_letter(tok: str) -> bool:
    # exact \p{L} (category L*), matching the RE2 flat filter bit-for-bit
    import unicodedata

    return any(unicodedata.category(c).startswith("L") for c in tok)


def _keep_token(tok: str) -> bool:
    """skip_word_none + skip_word_number: must contain a letter, and must
    not end with NUMBER rule status — i.e. a trailing digit whose effective
    predecessor (marks transparent) is anything but a letter. A single
    digit right after a letter keeps LETTER status (see ENDS_NUMBER)."""
    import unicodedata

    if not _has_letter(tok):
        return False
    i = len(tok) - 1
    while i >= 0 and unicodedata.category(tok[i]) in ("Mn", "Mc", "Me"):
        i -= 1
    if i < 0 or unicodedata.category(tok[i]) != "Nd":
        return True  # ends in a letter-ish char: LETTER status
    i -= 1
    while i >= 0 and unicodedata.category(tok[i]) in ("Mn", "Mc", "Me"):
        i -= 1
    return i >= 0 and unicodedata.category(tok[i]).startswith("L")


def tokenize_to_lists(texts: pd.Series | list[str]) -> list[list[str]]:
    """Arrow tokenizer -> Python lists, with the has-letter skip applied.
    Used by the sentence engine (which needs per-sentence Python loops
    anyway) and by tests."""
    import pyarrow as pa

    if not isinstance(texts, pd.Series):
        texts = pd.Series(list(texts), dtype=object)
    if len(texts) == 0:
        return []
    toks, needs_filter = tokenize_arrow(pa.Array.from_pandas(texts.astype(str)))
    if needs_filter:
        return [[t for t in doc if t and _keep_token(t)] for doc in toks.to_pylist()]
    return [[t for t in doc if t] for doc in toks.to_pylist()]


# --------------------------------------------------------------------------
# sentence segmentation (UAX-29 SB-lite)
# --------------------------------------------------------------------------

_SENT_CAND = re.compile(r"([.!?…]+)[\"'’”)\]]*\s+")


def split_sentence_strings(text: str) -> list[str]:
    """Sentence segments. Break after a terminal ([.!?…] + closers + space)
    unless the LAST terminal of the run is a full stop followed by a
    lowercase character (SB8: ATerm Close* Sp* x Lower — so '...' before
    lowercase does not break, while a run ending in '!'/'?' (STerm, SB11)
    always breaks, e.g. 'Stop.? go')."""
    out: list[str] = []
    start = 0
    for m in _SENT_CAND.finditer(text):
        nxt = text[m.end() : m.end() + 1]
        if m.group(1)[-1] == "." and nxt.islower():
            continue
        out.append(text[start : m.end()])
        start = m.end()
    tail = text[start:]
    if tail:
        out.append(tail)
    return out


def tokenize_sentences(text: str) -> list[list[str]]:
    """T2 contract: sentence split -> per-sentence word tokens with ', '
    replaced by the c_c marker; empty sentences dropped
    (tokenize_texts(type='sentence'), /root/reference/R/sentiment_engines.R:18-27)."""
    sents = [s.replace(", ", " c_c ") for s in split_sentence_strings(text)]
    return [t for t in tokenize_to_lists(sents) if t]
