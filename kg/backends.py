"""Executor-side NER detector-backend registry (O18).

Reference semantics (/root/reference/src/hu_entity/spacy_wrapper.py:80-116,
server.py:290-303): the service keeps a per-process registry of loaded spaCy
models keyed by language + minimal-mode — models load lazily on first use
(``__load_model``: lang -> [sm, md] with md preferred unless minimal mode,
fallback to sm, unknown lang raises) and ``reload_model`` swaps the loaded
model when configuration changes.

Spark analogue: model state must live PER PYTHON WORKER (executors cannot
share driver objects), so this module provides

- a driver-side **registry** mapping backend name -> factory. The resolved
  factory travels to workers inside the mapInPandas closure (cloudpickle),
  so custom backends registered at runtime work without any cluster-wide
  installation step.
- a worker-side **lazy singleton cache** keyed by
  ``(backend_name, lang, minimal_mode, generation)``. The first batch that
  needs a (lang, mode) pair instantiates the backend; subsequent batches on
  the same worker reuse it (worker processes are reused across tasks by
  default: ``spark.python.worker.reuse``).
- **reload** (the ``reload_model`` analogue): ``reload_backends()`` bumps a
  module-level generation on the driver; plans built afterwards carry the
  new generation, which misses the worker cache and re-instantiates — the
  distributed equivalent of swapping the in-process model.

The default ``rule`` backend wraps kg.detect (deterministic rules — spaCy
models are unavailable in this environment, SURVEY.md §7); anything exposing
``detect(text, lang=..., custom_entities=...) -> list[Mention]`` plugs in.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from kg.detect import Mention

__all__ = [
    "DetectorBackend",
    "RuleBackend",
    "register_backend",
    "resolve_backend",
    "reload_backends",
    "get_backend_cached",
    "UnknownLanguageError",
]


class UnknownLanguageError(ValueError):
    """Raised for a language the backend has no resources for (the
    reference's unknown-lang KeyError at spacy_wrapper.py:90)."""


class DetectorBackend:
    """Interface contract for NER backends (duck-typed; subclassing is
    optional). ``detect`` must be deterministic for a given input."""

    def detect(
        self,
        text: str,
        lang: str = "en",
        custom_entities: dict[str, str] | None = None,
    ) -> list[Mention]:
        raise NotImplementedError


class RuleBackend(DetectorBackend):
    """Deterministic rule backend (kg.detect) behind the registry interface.

    ``minimal_mode`` mirrors the reference's sm-vs-md model selection
    (spacy_wrapper.py:94-101): minimal skips the heuristic name detectors
    (title/suffix PERSON/ORG guesses — the "statistical" part of the rule
    stand-in) and keeps only value rules + the name gazetteer + custom
    matcher, trading recall for per-doc cost exactly like loading the small
    model instead of the medium one.
    """

    #: languages the rule set has resources for (latin-script generic rules
    #: + the stoplist languages; the reference registry is en/es/fr/it/pt/nl)
    SUPPORTED_LANGS = frozenset({"en", "es", "fr", "it", "pt", "nl", "de"})

    def __init__(self, lang: str = "en", minimal_mode: bool = False) -> None:
        if lang not in self.SUPPORTED_LANGS:
            raise UnknownLanguageError(
                f"no detector resources for lang {lang!r} "
                f"(supported: {sorted(self.SUPPORTED_LANGS)})"
            )
        self.lang = lang
        self.minimal_mode = minimal_mode

    def detect(
        self,
        text: str,
        lang: str = "en",
        custom_entities: dict[str, str] | None = None,
    ) -> list[Mention]:
        from kg import detect as d

        if not self.minimal_mode:
            return d.detect(text, lang=lang, custom_entities=custom_entities)
        # minimal mode: value rules + gazetteer phrases only (no heuristic
        # title/suffix name guessing), same overlap/custom/category pipeline
        tokens = d.word_tokens(text)
        mentions = d._detect_value_mentions(text)
        n = len(tokens)
        claimed: set[int] = set()
        for width in range(d._MAX_NAME_WORDS, 0, -1):
            for i in range(0, n - width + 1):
                if any(kk in claimed for kk in range(i, i + width)):
                    continue
                phrase = text[tokens[i].start : tokens[i + width - 1].end]
                label = d.NAME_GAZETTEER.get(phrase.lower())
                if label is None:
                    continue
                mentions.append(
                    d.Mention(
                        phrase, label, d.CATEGORY_MAP.get(label),
                        tokens[i].start, tokens[i + width - 1].end, i, i + width,
                    )
                )
                claimed.update(range(i, i + width))
        d._attach_token_spans(mentions, tokens)
        if custom_entities:
            candidates = d.match_custom_patterns(tokens, custom_entities)
            mentions = d.resolve_overlaps(text, mentions, candidates, tokens)
        mapped = [m for m in mentions if m.category is not None]
        mapped.sort(key=lambda m: (m.start, m.end))
        return mapped


BackendFactory = Callable[[str, bool], DetectorBackend]

# ---- driver-side registry ----

_REGISTRY: dict[str, BackendFactory] = {
    "rule": lambda lang, minimal: RuleBackend(lang, minimal),
}

#: bumped by reload_backends(); plans capture the value at build time
_GENERATION = 0


def register_backend(name: str, factory: BackendFactory) -> None:
    """Register (or replace) a backend factory. ``factory(lang, minimal)``
    must return a detect()-capable instance. Plans built AFTER registration
    use the new factory (the resolved factory is serialized into the task
    closure); already-built plans are unaffected."""
    _REGISTRY[name] = factory


def resolve_backend(name: str) -> tuple[BackendFactory, int]:
    """Driver-side: resolve name -> (factory, current generation) for
    embedding into a task closure. Unknown names fail fast at plan time."""
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown detector backend {name!r} (registered: {sorted(_REGISTRY)})"
        )
    return _REGISTRY[name], _GENERATION


def reload_backends() -> int:
    """Invalidate every worker's backend cache for plans built from now on
    (the reference's reload_model analogue, server.py:290-303). Returns the
    new generation."""
    global _GENERATION
    _GENERATION += 1
    return _GENERATION


# ---- worker-side lazy singleton cache ----

_CACHE: dict[tuple[str, str, bool, int], Any] = {}


def get_backend_cached(
    name: str,
    factory: BackendFactory,
    lang: str,
    minimal_mode: bool,
    generation: int,
) -> Any:
    """Worker-side lazy singleton: one backend instance per
    (name, lang, minimal_mode, generation) per Python worker process. A
    generation bump (reload) makes the old entry unreachable; STRICTLY OLDER
    entries for the same (name, lang, mode) are evicted eagerly to release
    model memory. Eviction is monotonic (only generation < incoming): while
    old-plan and new-plan tasks interleave on a worker during a reload
    rollout, the newer generation's instance must survive a lookup from an
    older plan — evicting on mere inequality made the two generations evict
    each other and re-instantiate expensive backends per batch."""
    key = (name, lang, bool(minimal_mode), generation)
    inst = _CACHE.get(key)
    if inst is None:
        for old in [k for k in _CACHE if k[:3] == key[:3] and k[3] < generation]:
            del _CACHE[old]
        inst = factory(lang, minimal_mode)
        _CACHE[key] = inst
    return inst
