"""Answer-extraction filter steps that need more than a plain regex —
choice-aware, mapping, and number-parsing extraction for the BBH / MMLU
chain-of-thought task families.

Behavioral specs (re-implemented, not copied):
- multi_choice_extract: lm_eval/tasks/mmlu/flan_n_shot/generative/utils.py
  ``MultiChoiceRegexFilter`` — primary "(A)"-style regex, then choice-TEXT
  matching mapped back to "(X)", then a bare ": A" letter fallback.
- map_regex_extract: lm_eval/tasks/bbh/cot_zeroshot/utils.py
  ``MapRegexFilter`` — the union regex picks the occurrence, the first
  matching sub-pattern names the value.
- number_parse_extract: same file, ``NumberParseRegexFilter`` — digits
  first, then spelled-out English numbers.
- word_sort_extract: same file, ``WordSortFilter`` — last-occurrence order
  of the words listed after "List:" in the prompt.

All functions are pure text -> text; unmatched inputs return ``fallback``.
"""

from __future__ import annotations

import re
import string
from typing import Dict, List, Optional, Sequence

_FALLBACK = "[invalid]"


def _normalize(text: str, ignore_case: bool, ignore_punctuation: bool,
               regexes_to_ignore: Optional[Sequence[str]] = None) -> str:
    for pat in regexes_to_ignore or ():
        text = re.sub(pat, "", text)
    if ignore_case:
        text = text.lower()
    if ignore_punctuation:
        text = text.translate(str.maketrans("", "", string.punctuation))
    return text


def _pick(matches: List, select: str):
    if not matches:
        return None
    m = matches[-1] if select == "last" else matches[0]
    if isinstance(m, tuple):
        m = next((g for g in m if g), "")
    return m.strip()


def multi_choice_extract(
    text: str,
    choices: Sequence[str],
    pattern: str = r"(\([A-Z]\))",
    select: str = "first",
    ignore_case: bool = False,
    ignore_punctuation: bool = False,
    fallback: str = _FALLBACK,
    doc_input: str = "",
) -> str:
    """Extract a "(X)" answer: regex, then choice text, then bare letter.

    Without an explicit choice list the options are parsed out of the
    prompt's "(A) ..." lines (BBH's in-prompt options; reference:
    bbh/cot_zeroshot/utils.py MultiChoiceRegexFilter).
    """
    if not choices and doc_input:
        choices = [c.strip() for c in re.findall(r"\([A-Z]\)([^\n(]*)", doc_input)]
    m = _pick(re.findall(pattern, text), select)
    if m:
        return m
    letters = [chr(ord("A") + i) for i in range(len(choices))]
    if choices:
        norm = [
            _normalize(str(c).strip(), ignore_case, ignore_punctuation)
            for c in choices
        ]
        by_text = re.compile("|".join(re.escape(c) for c in norm if c))
        m = _pick(by_text.findall(
            _normalize(text, ignore_case, ignore_punctuation)), select)
        if m:
            for c, letter in zip(norm, letters):
                if m == c:
                    return f"({letter})"
        bare = re.compile(rf":[\s]*({'|'.join(letters)})")
        m = _pick(bare.findall(text), select)
        if m:
            return f"({m})"
    return fallback


def map_regex_extract(
    text: str,
    mapping: Dict[str, str],
    select: str = "first",
    ignore_case: bool = False,
    fallback: str = _FALLBACK,
) -> str:
    """Union-regex match picked by ``select``; the first sub-pattern that
    re-matches the picked occurrence names the value."""
    norm = _normalize(text, ignore_case, False)
    hit = _pick(re.findall("|".join(mapping), norm), select)
    if hit:
        for pat, value in mapping.items():
            if re.search(pat, hit):
                return value
    return fallback


# Spelled-out English numbers (enough for BBH counting/arithmetic answers).
_UNITS = {
    "zero": 0, "one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
    "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10, "eleven": 11,
    "twelve": 12, "thirteen": 13, "fourteen": 14, "fifteen": 15,
    "sixteen": 16, "seventeen": 17, "eighteen": 18, "nineteen": 19,
}
_TENS = {
    "twenty": 20, "thirty": 30, "forty": 40, "fifty": 50,
    "sixty": 60, "seventy": 70, "eighty": 80, "ninety": 90,
}
_SCALES = {"hundred": 100, "thousand": 1000, "million": 10 ** 6,
           "billion": 10 ** 9}
_NUMBER_WORD = re.compile(
    r"\b(?:" + "|".join(list(_UNITS) + list(_TENS) + list(_SCALES))
    + r")(?:[\s,-]+(?:" + "|".join(
        list(_UNITS) + list(_TENS) + list(_SCALES) + ["and"]) + r"))*\b"
)


def _words_to_number(phrase: str) -> int:
    total, current = 0, 0
    for word in re.split(r"[\s,-]+", phrase):
        if word in _UNITS:
            current += _UNITS[word]
        elif word in _TENS:
            current += _TENS[word]
        elif word == "hundred":
            current = max(current, 1) * 100
        elif word in _SCALES:
            total += max(current, 1) * _SCALES[word]
            current = 0
        # "and" joins, anything else was excluded by the regex
    return total + current


def number_parse_extract(
    text: str,
    pattern: str = r"([-0-9]+)",
    select: str = "first",
    fallback: str = _FALLBACK,
) -> str:
    """Digit-string answer; falls back to spelled-out English numbers."""
    m = _pick(re.findall(pattern, text), select)
    if m:
        return m
    m = _pick(_NUMBER_WORD.findall(text.lower()), select)
    if m:
        return str(_words_to_number(m))
    return fallback


def word_sort_extract(text: str, doc_input: str) -> str:
    """Order of the prompt's "List:" words by their LAST occurrence in the
    generation (dedup keeps the final mention, preserving claimed order)."""
    words = doc_input.split("List:")[-1].strip().split()
    found = re.findall("|".join(rf"\b{re.escape(w)}\b" for w in words), text)
    last_order: Dict[str, None] = {}
    for w in reversed(found):
        last_order.setdefault(w, None)
    return " ".join(reversed(list(last_order)))
