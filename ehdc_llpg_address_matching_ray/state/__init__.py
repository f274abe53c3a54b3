"""Stateful serving-side components (ST2-ST4 analogue): in-memory\ngazetteer index + single-query match/explain surface."""

from .index import GazetteerIndex, RankedCandidate  # noqa: F401
