"""Prompt library behind task configs' ``use_prompt:`` key.

Reference surface: rag-evaluation-harness/lm_eval/prompts/__init__.py.
A ``use_prompt: <category>:<name>`` swaps the task's doc_to_text /
doc_to_target for a prompt template drawn from one of three categories:

* a built-in registry (``qa-basic:question-newline-answer``) — resolves
  to a Jinja template STRING used for both doc_to_text and doc_to_target
  (reference: lm_eval/prompts/__init__.py:13-18, api/task.py:1160-1175);
* a local prompt YAML (``<path>.yaml:<name>``) — the file's ``prompts:``
  mapping holds named ``{doc_to_text, doc_to_target}`` template pairs;
  resolves to a :class:`PromptTemplate` whose ``apply(doc)`` returns
  ``[text, target]`` (reference: PromptString, prompts/__init__.py:52-59,
  111-126);
* ``promptsource:<template-name>`` — the external promptsource template
  collection. NOT bundled: the reference imports it lazily and raises when
  it is not pip-installed (prompts/__init__.py:29-36), and it is not
  installed in this image, so we raise the same way with a porting hint.

Wildcard expansion (``load_prompt_list``) mirrors the reference's
``utils.pattern_match`` fnmatch semantics for ``<file>.yaml:qa_*`` style
selectors (reference: prompts/__init__.py:70-108).
"""

from __future__ import annotations

import fnmatch
import os
from typing import Dict, List, Optional

import yaml

__all__ = [
    "PROMPT_REGISTRY",
    "PromptTemplate",
    "get_prompt",
    "load_prompt_list",
    "render_jinja",
]

# Built-in prompt registry, keyed category -> prompt name -> Jinja template
# string (reference: lm_eval/prompts/__init__.py:13-18 PROMPT_REGISTRY).
PROMPT_REGISTRY: Dict[str, Dict[str, str]] = {
    "qa-basic": {
        "question-newline-answer": "Question: {{question}}\nAnswer:",
        "q-newline-a": "Q: {{question}}\nA:",
    },
}


def render_jinja(template: str, doc: dict) -> str:
    """Render a Jinja template over one doc (reference: lm_eval/utils.py:438
    apply_template, with the same StrictUndefined environment so a missing
    doc field fails loudly instead of silently rendering '')."""
    from jinja2 import BaseLoader, Environment, StrictUndefined

    env = Environment(loader=BaseLoader, undefined=StrictUndefined,
                      keep_trailing_newline=True)
    return env.from_string(template).render(**doc)


class PromptTemplate:
    """A doc_to_text/doc_to_target Jinja pair from a prompt YAML.

    ``apply(doc)`` returns ``[text, target]`` — the caller uses [0] as the
    prompt and [1] as the gold continuation (reference: PromptString.apply,
    lm_eval/prompts/__init__.py:111-126; consumed at api/task.py:1183-1189
    and 1227-1233).
    """

    def __init__(self, prompt_string: Dict[str, str], name: str = ""):
        if "doc_to_choice" in prompt_string:
            # Same limitation as the reference's PromptString (:120-121).
            raise NotImplementedError(
                "prompt YAML doc_to_choice is not supported — declare "
                "doc_to_choice on the task config instead"
            )
        try:
            self.doc_to_text = prompt_string["doc_to_text"]
            self.doc_to_target = prompt_string["doc_to_target"]
        except (KeyError, TypeError):
            raise ValueError(
                f"prompt {name or prompt_string!r} must be a mapping with "
                "doc_to_text and doc_to_target keys"
            )
        self.name = name

    def apply(self, doc: dict) -> List[str]:
        return [
            render_jinja(self.doc_to_text, doc),
            render_jinja(self.doc_to_target, doc),
        ]

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"PromptTemplate({self.name or self.doc_to_text!r})"


def _split(prompt_id: str):
    if ":" not in prompt_id:
        raise ValueError(
            "expected `<category>:<prompt name>` (a single `:` separator), "
            f"got {prompt_id!r}"
        )
    category, _, name = prompt_id.rpartition(":")
    return category, name


def _load_prompt_yaml(path: str, yaml_dir: Optional[str]) -> Dict[str, dict]:
    """Load a prompt file's ``prompts:`` mapping; a relative path resolves
    against the task YAML's directory first (reference: load_prompt_list's
    yaml_path join, prompts/__init__.py:90-91), then the cwd."""
    cand = path
    if not os.path.isabs(path) and yaml_dir is not None:
        joined = os.path.realpath(os.path.join(yaml_dir, path))
        if os.path.exists(joined) or not os.path.exists(path):
            cand = joined
    with open(cand, "rb") as f:
        loaded = yaml.safe_load(f)
    prompts = (loaded or {}).get("prompts")
    if not isinstance(prompts, dict):
        raise ValueError(f"prompt file {cand} has no `prompts:` mapping")
    return prompts


def get_prompt(
    prompt_id: str,
    dataset_name: Optional[str] = None,
    subset_name: Optional[str] = None,
    yaml_dir: Optional[str] = None,
):
    """Resolve one ``category:name`` prompt id.

    Returns a template STRING for registry prompts or a
    :class:`PromptTemplate` for YAML prompts (reference: get_prompt,
    lm_eval/prompts/__init__.py:21-67).
    """
    category, name = _split(prompt_id)
    if category == "promptsource":
        # Lazy-import exactly like the reference; in this image (and any
        # install without the promptsource extra) this raises — identical
        # observable behavior, plus a porting hint.
        try:
            from promptsource.templates import DatasetTemplates  # type: ignore
        except ModuleNotFoundError:
            raise ModuleNotFoundError(
                f"use_prompt={prompt_id!r} needs the external promptsource "
                "template library, which is not installed (the reference "
                "raises here too without its [promptsource] extra). Port "
                "the template into a local prompt YAML "
                "(`use_prompt: <file>.yaml:<name>`) or into doc_to_text/"
                "doc_to_target."
            )
        templates = (
            DatasetTemplates(dataset_name=dataset_name)
            if subset_name is None
            else DatasetTemplates(dataset_name=dataset_name, subset_name=subset_name)
        )
        if name not in templates.all_template_names:
            raise ValueError(
                f"{name} not in prompt list {templates.all_template_names}"
            )
        return templates[name]
    if category.endswith(".yaml"):
        prompts = _load_prompt_yaml(category, yaml_dir)
        if name not in prompts:
            raise ValueError(
                f"prompt {name!r} not in {category} "
                f"(has {sorted(prompts)})"
            )
        return PromptTemplate(prompts[name], name=name)
    try:
        return PROMPT_REGISTRY[category][name]
    except KeyError:
        raise ValueError(
            f"unknown prompt {prompt_id!r}: category {category!r} is not a "
            f".yaml file, `promptsource`, or a registry category "
            f"{sorted(PROMPT_REGISTRY)}"
        )


def load_prompt_list(
    use_prompt: str,
    dataset_name: Optional[str] = None,
    subset_name: Optional[str] = None,
    yaml_path: Optional[str] = None,
) -> List[str]:
    """Expand a (possibly wildcarded) prompt selector into concrete
    ``category:name`` ids (reference: load_prompt_list,
    lm_eval/prompts/__init__.py:70-108)."""
    category, pattern = _split(use_prompt)
    if category == "promptsource":
        from promptsource.templates import DatasetTemplates  # type: ignore

        templates = (
            DatasetTemplates(dataset_name=dataset_name)
            if subset_name is None
            else DatasetTemplates(dataset_name=dataset_name, subset_name=subset_name)
        )
        names = templates.all_template_names
    elif category.endswith(".yaml"):
        if yaml_path is not None and not os.path.isabs(category):
            category = os.path.realpath(os.path.join(yaml_path, category))
        names = list(_load_prompt_yaml(category, None))
    else:
        names = list(PROMPT_REGISTRY.get(category, {}))
    return [f"{category}:{n}" for n in sorted(fnmatch.filter(names, pattern))]
