"""IFEval instruction-following checkers (Zhou et al. 2023).

Clean-room implementation of the verifiable-instruction registry the
reference vendors from google-research (reference:
rag-evaluation-harness/lm_eval/tasks/ifeval/instructions*.py). Each
checker answers "did the response follow instruction X with kwargs Y".

Scoring (reference: lm_eval/tasks/ifeval/utils.py):
  * strict: check the raw response;
  * loose: a response passes if ANY of 8 relaxed variants passes
    (asterisks stripped; first/last line removed in all combinations);
  * prompt-level = all of a prompt's instructions followed;
    instruction-level = mean over every (prompt, instruction) pair.

``language:response_language`` uses a script/stopword heuristic instead of
the reference's langdetect dependency (documented divergence; langdetect
is itself probabilistic).
"""

from __future__ import annotations

import json
import re
from typing import Callable, Dict, List

# ----------------------------------------------------------------- helpers

_COMPARISON = {
    "at least": lambda count, n: count >= n,
    "less than": lambda count, n: count < n,
    "equal to": lambda count, n: count == n,
}


def _count_words(text: str) -> int:
    return len(re.findall(r"\w+", text))


def _count_sentences(text: str) -> int:
    # Sentence = non-empty segment ending in ./!/? (the IFEval convention
    # of a simple terminator split, no abbreviation handling).
    parts = re.split(r"[.!?]+(?:\s|$)", text)
    return sum(1 for p in parts if p.strip())


def _relation_ok(relation: str, count: int, n: int) -> bool:
    try:
        return _COMPARISON[relation](count, n)
    except KeyError:
        raise ValueError(f"unknown relation {relation!r} (expected {list(_COMPARISON)})")


# Latin-script stopword anchors + unicode script ranges for the
# response-language heuristic.
_LANG_STOPWORDS = {
    "en": {"the", "and", "is", "of", "to", "a", "in", "that", "you", "it"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "ich", "zu", "mit"},
    "es": {"el", "la", "que", "de", "y", "los", "es", "una", "por", "con"},
    "fr": {"le", "la", "les", "des", "est", "une", "que", "dans", "pour", "vous"},
    "it": {"il", "la", "che", "di", "e", "un", "per", "sono", "della", "con"},
    "pt": {"o", "que", "de", "e", "um", "uma", "para", "com", "os", "é"},
    "nl": {"de", "het", "een", "en", "van", "is", "dat", "niet", "voor", "met"},
    "sw": {"ya", "na", "kwa", "ni", "katika", "wa", "hii", "za", "kama", "hiyo"},
    "fi": {"ja", "on", "ei", "se", "että", "olla", "joka", "mutta", "kun", "myös"},
    "vi": {"là", "của", "và", "có", "không", "những", "một", "cho", "bạn", "với"},
    "ro": {"și", "este", "de", "la", "un", "o", "în", "pentru", "care", "nu"},
    "pl": {"i", "w", "nie", "jest", "na", "się", "do", "że", "ale", "jak"},
    "tr": {"ve", "bir", "bu", "için", "ile", "değil", "çok", "daha", "gibi", "ben"},
    "cs": {"a", "je", "na", "se", "to", "není", "ale", "jako", "pro", "že"},
    "da": {"og", "er", "det", "en", "at", "ikke", "for", "på", "med", "jeg"},
    "sv": {"och", "är", "det", "en", "att", "inte", "för", "på", "med", "jag"},
    "no": {"og", "er", "det", "en", "å", "ikke", "for", "på", "med", "jeg"},
    "hu": {"és", "a", "az", "nem", "hogy", "egy", "van", "de", "is", "ez"},
    "id": {"yang", "dan", "di", "ini", "untuk", "dengan", "tidak", "adalah", "itu", "dari"},
}
_SCRIPT_RANGES = {
    "ar": (0x0600, 0x06FF), "fa": (0x0600, 0x06FF), "ur": (0x0600, 0x06FF),
    "ru": (0x0400, 0x04FF), "bg": (0x0400, 0x04FF), "uk": (0x0400, 0x04FF),
    "hi": (0x0900, 0x097F), "mr": (0x0900, 0x097F), "ne": (0x0900, 0x097F),
    "bn": (0x0980, 0x09FF), "pa": (0x0A00, 0x0A7F), "gu": (0x0A80, 0x0AFF),
    "ta": (0x0B80, 0x0BFF), "te": (0x0C00, 0x0C7F), "kn": (0x0C80, 0x0CFF),
    "ml": (0x0D00, 0x0D7F), "th": (0x0E00, 0x0E7F), "he": (0x0590, 0x05FF),
    "el": (0x0370, 0x03FF), "ko": (0xAC00, 0xD7AF), "zh": (0x4E00, 0x9FFF),
    "ja": (0x3040, 0x30FF), "my": (0x1000, 0x109F), "ka": (0x10A0, 0x10FF),
    "hy": (0x0530, 0x058F), "am": (0x1200, 0x137F),
}


def _response_language_ok(text: str, language: str) -> bool:
    if language in _SCRIPT_RANGES:
        lo, hi = _SCRIPT_RANGES[language]
        in_script = sum(1 for c in text if lo <= ord(c) <= hi)
        letters = sum(1 for c in text if c.isalpha())
        return letters > 0 and in_script / letters > 0.3
    words = set(re.findall(r"[^\W\d_]+", text.lower(), flags=re.UNICODE))
    table = _LANG_STOPWORDS.get(language)
    if table is None:
        # Latin-script language with no stopword table: the dominant real
        # failure mode is answering in English, so require the text NOT to
        # look English (and to be non-empty).
        return bool(words) and len(words & _LANG_STOPWORDS["en"]) < 2
    hits = len(words & table)
    other = max(
        (len(words & t) for lang, t in _LANG_STOPWORDS.items() if lang != language),
        default=0,
    )
    return hits >= 2 and hits >= other


# ----------------------------------------------------------------- checkers

def _keywords_existence(text: str, *, keywords: List[str], **_) -> bool:
    low = text.lower()
    return all(re.search(rf"\b{re.escape(k.lower())}\b", low) for k in keywords)


def _keywords_frequency(text: str, *, keyword: str, frequency: int, relation: str, **_) -> bool:
    count = len(re.findall(rf"\b{re.escape(keyword.lower())}\b", text.lower()))
    return _relation_ok(relation, count, frequency)


def _forbidden_words(text: str, *, forbidden_words: List[str], **_) -> bool:
    low = text.lower()
    return not any(re.search(rf"\b{re.escape(w.lower())}\b", low) for w in forbidden_words)


def _letter_frequency(text: str, *, letter: str, let_frequency: int, let_relation: str, **_) -> bool:
    count = text.lower().count(letter.lower())
    return _relation_ok(let_relation, count, let_frequency)


def _number_sentences(text: str, *, num_sentences: int, relation: str, **_) -> bool:
    return _relation_ok(relation, _count_sentences(text), num_sentences)


def _number_paragraphs(text: str, *, num_paragraphs: int, **_) -> bool:
    # paragraphs are separated by the markdown divider *** (IFEval spec);
    # a blank INTERIOR paragraph is a violation (edge blanks from leading/
    # trailing dividers are tolerated, matching the reference checker)
    segments = re.split(r"\s?\*\*\*\s?", text)
    if any(not s.strip() for s in segments[1:-1]):
        return False
    paragraphs = [s for s in segments if s.strip()]
    return len(paragraphs) == num_paragraphs


def _number_words(text: str, *, num_words: int, relation: str, **_) -> bool:
    return _relation_ok(relation, _count_words(text), num_words)


def _nth_paragraph_first_word(
    text: str, *, num_paragraphs: int, nth_paragraph: int, first_word: str, **_
) -> bool:
    paragraphs = [p.strip() for p in text.split("\n\n") if p.strip()]
    if len(paragraphs) != num_paragraphs or not 1 <= nth_paragraph <= len(paragraphs):
        return False
    first = re.findall(r"\w+", paragraphs[nth_paragraph - 1])
    return bool(first) and first[0].lower() == first_word.lower()


def _number_placeholders(text: str, *, num_placeholders: int, **_) -> bool:
    return len(re.findall(r"\[.*?\]", text)) >= num_placeholders


def _postscript(text: str, *, postscript_marker: str, **_) -> bool:
    # marker may appear anywhere, with optional spaces between the dotted
    # letters ("P.S." also matches "p. s.") — the reference's unanchored
    # r"\s*p\.\s?s\..*$" behavior
    pattern = re.escape(postscript_marker.lower()).replace(r"\.", r"\.\s?")
    return re.search(pattern, text.lower()) is not None


def _number_bullet_lists(text: str, *, num_bullets: int, **_) -> bool:
    bullets = re.findall(r"^\s*\*[^*].*$", text, flags=re.MULTILINE)
    bullets += re.findall(r"^\s*-.*$", text, flags=re.MULTILINE)
    return len(bullets) == num_bullets


def _constrained_response(text: str, **_) -> bool:
    return any(
        option in text
        for option in ("My answer is yes.", "My answer is no.", "My answer is maybe.")
    )


def _number_highlighted_sections(text: str, *, num_highlights: int, **_) -> bool:
    # *single* sections must not double-count the interior of **double**
    # sections, hence the lookaround guards
    single = [
        m for m in re.findall(r"(?<!\*)\*[^\n*]+\*(?!\*)", text) if m.strip("*").strip()
    ]
    double = [m for m in re.findall(r"\*\*[^\n*]+\*\*", text) if m.strip("*").strip()]
    return len(single) + len(double) >= num_highlights


def _multiple_sections(text: str, *, section_spliter: str, num_sections: int, **_) -> bool:
    pattern = rf"\s?{re.escape(section_spliter)}\s?\d+"
    return len(re.findall(pattern, text)) >= num_sections


def _json_format(text: str, **_) -> bool:
    stripped = (
        text.strip()
        .removeprefix("```json")
        .removeprefix("```Json")
        .removeprefix("```JSON")
        .removeprefix("```")
        .removesuffix("```")
        .strip()
    )
    try:
        json.loads(stripped)
        return True
    except ValueError:
        return False


def _title(text: str, **_) -> bool:
    return any(t.strip() for t in re.findall(r"<<(.*?)>>", text))


def _capital_word_frequency(text: str, *, capital_frequency: int, capital_relation: str, **_) -> bool:
    caps = [w for w in re.findall(r"\b\w+\b", text) if w.isupper()]
    return _relation_ok(capital_relation, len(caps), capital_frequency)


def _english_capital(text: str, **_) -> bool:
    return not any(c.islower() for c in text)


def _english_lowercase(text: str, **_) -> bool:
    return not any(c.isupper() for c in text)


def _no_comma(text: str, **_) -> bool:
    return "," not in text


def _end_checker(text: str, *, end_phrase: str, **_) -> bool:
    return text.strip().strip('"').lower().endswith(end_phrase.strip().strip('"').lower())


def _quotation(text: str, **_) -> bool:
    s = text.strip()
    return len(s) >= 2 and s.startswith('"') and s.endswith('"')


def _repeat_prompt(text: str, *, prompt_to_repeat: str, **_) -> bool:
    return text.strip().lower().startswith(prompt_to_repeat.strip().lower())


def _two_responses(text: str, **_) -> bool:
    parts = [p.strip() for p in text.split("******")]
    non_empty = [p for p in parts if p]
    return len(parts) == 2 and len(non_empty) == 2 and non_empty[0] != non_empty[1]


def _response_language(text: str, *, language: str, **_) -> bool:
    return _response_language_ok(text, language)


CHECKERS: Dict[str, Callable[..., bool]] = {
    "keywords:existence": _keywords_existence,
    "keywords:frequency": _keywords_frequency,
    "keywords:forbidden_words": _forbidden_words,
    "keywords:letter_frequency": _letter_frequency,
    "language:response_language": _response_language,
    "length_constraints:number_sentences": _number_sentences,
    "length_constraints:number_paragraphs": _number_paragraphs,
    "length_constraints:number_words": _number_words,
    "length_constraints:nth_paragraph_first_word": _nth_paragraph_first_word,
    "detectable_content:number_placeholders": _number_placeholders,
    "detectable_content:postscript": _postscript,
    "detectable_format:number_bullet_lists": _number_bullet_lists,
    "detectable_format:constrained_response": _constrained_response,
    "detectable_format:number_highlighted_sections": _number_highlighted_sections,
    "detectable_format:multiple_sections": _multiple_sections,
    "detectable_format:json_format": _json_format,
    "detectable_format:title": _title,
    "change_case:capital_word_frequency": _capital_word_frequency,
    "change_case:english_capital": _english_capital,
    "change_case:english_lowercase": _english_lowercase,
    "punctuation:no_comma": _no_comma,
    "startend:end_checker": _end_checker,
    "startend:quotation": _quotation,
    "combination:repeat_prompt": _repeat_prompt,
    "combination:two_responses": _two_responses,
}


def follows_instruction(response: str, instruction_id: str, kwargs: dict | None) -> bool:
    """Strict check for one instruction."""
    try:
        checker = CHECKERS[instruction_id]
    except KeyError:
        raise KeyError(
            f"unsupported IFEval instruction {instruction_id!r}; "
            f"supported: {sorted(CHECKERS)}"
        )
    clean = {k: v for k, v in (kwargs or {}).items() if v is not None}
    return bool(checker(response, **clean))


def _loose_variants(response: str) -> List[str]:
    lines = response.split("\n")
    bases = [
        response,
        "\n".join(lines[1:]).strip(),
        "\n".join(lines[:-1]).strip(),
        "\n".join(lines[1:-1]).strip(),
    ]
    return bases + [b.replace("*", "") for b in bases]


def score_response(response: str, instruction_ids: List[str], kwargs_list: List[dict]):
    """Per-instruction strict/loose booleans for one prompt.

    Returns ``(strict: [bool], loose: [bool])`` aligned with
    ``instruction_ids``.
    """
    strict, loose = [], []
    variants = _loose_variants(response)
    if len(kwargs_list) < len(instruction_ids):
        # malformed row: never silently drop instructions via zip truncation
        kwargs_list = list(kwargs_list) + [{}] * (len(instruction_ids) - len(kwargs_list))
    for iid, kw in zip(instruction_ids, kwargs_list):
        strict.append(follows_instruction(response, iid, kw))
        loose.append(any(follows_instruction(v, iid, kw) for v in variants))
    return strict, loose
