"""IFEval verifiable-instruction checkers + evaluator integration
(reference: lm_eval/tasks/ifeval/)."""

import json

import pytest

from retrieval_scaling_tpu.rag_eval.ifeval import (
    follows_instruction,
    score_response,
)


CASES = [
    ("keywords:existence", {"keywords": ["cat", "dog"]}, "The cat saw a dog.", True),
    ("keywords:existence", {"keywords": ["cat", "dog"]}, "The cat saw a bird.", False),
    ("keywords:frequency", {"keyword": "cat", "frequency": 2, "relation": "at least"},
     "cat and cat again", True),
    ("keywords:frequency", {"keyword": "cat", "frequency": 2, "relation": "less than"},
     "cat only once", True),
    ("keywords:forbidden_words", {"forbidden_words": ["bad"]}, "all good here", True),
    ("keywords:forbidden_words", {"forbidden_words": ["bad"]}, "this is bad", False),
    ("keywords:letter_frequency", {"letter": "z", "let_frequency": 2, "let_relation": "at least"},
     "zig zag", True),
    ("length_constraints:number_sentences", {"num_sentences": 2, "relation": "at least"},
     "One. Two. Three.", True),
    ("length_constraints:number_sentences", {"num_sentences": 5, "relation": "at least"},
     "One. Two.", False),
    ("length_constraints:number_paragraphs", {"num_paragraphs": 2},
     "first part\n***\nsecond part", True),
    ("length_constraints:number_words", {"num_words": 3, "relation": "less than"},
     "two words", True),
    ("length_constraints:nth_paragraph_first_word",
     {"num_paragraphs": 2, "nth_paragraph": 2, "first_word": "hello"},
     "first para\n\nhello there", True),
    ("detectable_content:number_placeholders", {"num_placeholders": 2},
     "use [name] at [address]", True),
    ("detectable_content:postscript", {"postscript_marker": "P.S."},
     "body text\nP.S. remember this", True),
    ("detectable_content:postscript", {"postscript_marker": "P.S."}, "no postscript", False),
    ("detectable_format:number_bullet_lists", {"num_bullets": 2},
     "* first\n* second", True),
    ("detectable_format:number_bullet_lists", {"num_bullets": 2},
     "* first\n* second\n* third", False),
    ("detectable_format:constrained_response", {}, "My answer is yes.", True),
    ("detectable_format:constrained_response", {}, "definitely", False),
    ("detectable_format:number_highlighted_sections", {"num_highlights": 2},
     "see *this* and **that**", True),
    ("detectable_format:multiple_sections", {"section_spliter": "Section", "num_sections": 2},
     "Section 1 intro Section 2 body", True),
    ("detectable_format:json_format", {}, '{"a": 1}', True),
    ("detectable_format:json_format", {}, '```json\n{"a": 1}\n```', True),
    ("detectable_format:json_format", {}, "not json", False),
    ("detectable_format:title", {}, "<<My Great Title>>\ncontent", True),
    ("change_case:capital_word_frequency", {"capital_frequency": 1, "capital_relation": "at least"},
     "this is VERY important", True),
    ("change_case:english_capital", {}, "ALL CAPS HERE 123.", True),
    ("change_case:english_capital", {}, "Not all Caps", False),
    ("change_case:english_lowercase", {}, "all lower here.", True),
    ("punctuation:no_comma", {}, "no commas here", True),
    ("punctuation:no_comma", {}, "one, comma", False),
    ("startend:end_checker", {"end_phrase": "the end"}, "story... the end", True),
    ("startend:quotation", {}, '"quoted response"', True),
    ("startend:quotation", {}, "unquoted", False),
    ("combination:repeat_prompt", {"prompt_to_repeat": "Write a poem"},
     "Write a poem about the sea...", True),
    ("combination:two_responses", {}, "answer one\n******\nanswer two", True),
    ("combination:two_responses", {}, "only one answer", False),
    ("language:response_language", {"language": "en"},
     "The weather is nice and it is a good day to walk in the park.", True),
    ("language:response_language", {"language": "ru"},
     "Погода сегодня хорошая и день отличный.", True),
    ("language:response_language", {"language": "ru"},
     "The weather is nice today and the day is great.", False),
    ("language:response_language", {"language": "de"},
     "Das ist ein guter Tag und ich bin nicht müde.", True),
]


@pytest.mark.parametrize("iid,kwargs,response,expected", CASES)
def test_instruction_checkers(iid, kwargs, response, expected):
    assert follows_instruction(response, iid, kwargs) is expected


def test_unknown_instruction_raises():
    with pytest.raises(KeyError):
        follows_instruction("text", "keywords:nonexistent", {})


def test_none_kwargs_are_dropped():
    # dataset rows pad kwargs dicts with nulls for unused fields
    assert follows_instruction(
        "no commas", "punctuation:no_comma", {"keywords": None}
    )


def test_loose_scoring_strips_asterisks_and_edge_lines():
    # strict fails (comma inside a bullet-decorated first line), loose
    # passes once the first line is dropped
    response = "Sure, here you go:\nno commas in the body"
    strict, loose = score_response(response, ["punctuation:no_comma"], [{}])
    assert strict == [False]
    assert loose == [True]


def test_ifeval_end_to_end(tmp_path):
    from retrieval_scaling_tpu.rag_eval.evaluator import simple_evaluate

    d = tmp_path / "ifeval"
    d.mkdir()
    rows = [
        {
            "key": 1,
            "prompt": "Reply in all caps without commas.",
            "instruction_id_list": ["change_case:english_capital", "punctuation:no_comma"],
            "kwargs": [{}, {}],
        },
        {
            "key": 2,
            "prompt": "Give a quoted answer.",
            "instruction_id_list": ["startend:quotation"],
            "kwargs": [{}],
        },
    ]
    with open(d / "train.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    class ScriptedGen:
        def generate_until(self, reqs):
            outs = []
            for r in reqs:
                outs.append("YES I WILL" if "caps" in r["context"] else "unquoted")
            return outs

    res = simple_evaluate(ScriptedGen(), ["ifeval"], data_root=str(tmp_path))
    scores = res["results"]["ifeval"]
    # prompt 1 follows both instructions; prompt 2 fails its only one
    assert scores["prompt_level_strict_acc"] == 0.5
    assert scores["inst_level_strict_acc"] == pytest.approx(2 / 3)
    assert scores["prompt_level_loose_acc"] == 0.5


MORE_CASES = [
    # a single **double** section must not double-count via the *single* regex
    ("detectable_format:number_highlighted_sections", {"num_highlights": 2},
     "see **that** only", False),
    # postscript matches mid-line and with spaced dotted letters
    ("detectable_content:postscript", {"postscript_marker": "P.S."},
     "thanks for reading. p.s. bring snacks", True),
    ("detectable_content:postscript", {"postscript_marker": "P.S."},
     "end.\nP. S. spaced letters", True),
    # a blank INTERIOR ***-separated paragraph is a violation
    ("length_constraints:number_paragraphs", {"num_paragraphs": 2},
     "para one *** *** para two", False),
    ("length_constraints:number_paragraphs", {"num_paragraphs": 2},
     "*** para one *** para two", True),
    # unknown Latin-script language: English answers must fail
    ("language:response_language", {"language": "et"},
     "The weather is nice and it is a good day.", False),
    ("language:response_language", {"language": "ro"},
     "Vremea este frumoasă și este o zi bună pentru plimbare în parc.", True),
]


@pytest.mark.parametrize("iid,kwargs,response,expected", MORE_CASES)
def test_instruction_checkers_regressions(iid, kwargs, response, expected):
    assert follows_instruction(response, iid, kwargs) is expected


def test_short_kwargs_list_pads_instead_of_truncating():
    strict, loose = score_response(
        "no commas, wait", ["punctuation:no_comma", "change_case:english_lowercase"], [{}]
    )
    assert len(strict) == 2 and len(loose) == 2
