"""Sensitive-data sanitization (``core/utils/ContentSanitizer.java:39-124``).

Regex→placeholder rules applied in rule order; rules are compiled ONCE (in an
actor's ``__init__`` or module scope) and reused per batch. Sequential
application resolves overlaps deterministically (the reference resolves
overlapping matches explicitly, ``ContentSanitizer.java:197-263``; sequential
rule order achieves the same fixed outcome for the default rule set).
"""

from __future__ import annotations

import re
from typing import Iterable, List, Pattern, Tuple

from ..config import DEFAULT_SANITIZATION_RULES, SanitizationRule


class ContentSanitizer:
    def __init__(self, rules: Iterable[SanitizationRule] = DEFAULT_SANITIZATION_RULES):
        self.rules: List[Tuple[Pattern[str], str]] = [
            (re.compile(r.pattern), r.replacement) for r in rules
        ]

    def sanitize(self, text: str) -> str:
        for pattern, replacement in self.rules:
            text = pattern.sub(replacement, text)
        return text

    def sanitize_many(self, texts: Iterable[str]) -> List[str]:
        return [self.sanitize(t) for t in texts]
