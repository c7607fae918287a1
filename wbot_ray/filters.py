"""Candidate-link filters.

Replicates the reference's filter chain in crawler order
(``/root/reference/crawler.go:249-274``):

1. scope check — parent's registrable domain must appear in the child host
   (``crawler.go:252``; NOTE this is *substring containment*, not suffix
   match — fidelity mode preserves the quirk, strict mode uses proper
   dot-suffix matching),
2. robots gate (see ``wbot_ray.robots``),
3. extension + allow/deny rule filter (``filter.go:30-57``),
4. seen-set dedup (handled by the dedup stage, not here).

All predicates are vectorizable: they take/return plain Python lists or are
applied per batch from ``map_batches`` UDFs.
"""

from __future__ import annotations

import re

from wbot_ray.config import FilterRule

# Same 43-extension deny regex as the reference (filter.go:9-11):
# case-sensitive, anchored at end of *path*.
BAD_EXTENSIONS_RE = re.compile(
    r"\.(png|jpg|jpeg|gif|ico|eps|pdf|iso|mp3|mp4|zip|aif|mpa|wav|wma|7z|deb"
    r"|pkg|rar|rpm|bin|dmg|dat|tar|exe|ps|psd|svg|tif|tiff|pps|ppt|pptx|xls"
    r"|xlsx|wmv|doc|docx|txt|mov|mpl|css|js)$"
)


class RuleFilter:
    """Per-root allow/deny rules with wildcard fallback (``filter.go:13-57``).

    Precedence (filter.go:44-56): bad-extension deny on the path; rule lookup
    by root, else ``"*"``, else **allow**; Disallow regexes first (any match
    ⇒ deny); then Allow (any match ⇒ allow); rule present but nothing
    matched ⇒ **deny**. Regexes match against the Go-serialized full URL
    (``u.URL.String()``, filter.go:45,51).
    """

    def __init__(self, rules: list[FilterRule] | None = None) -> None:
        self._rules: dict[str, tuple[list[re.Pattern], list[re.Pattern]]] = {}
        for rule in rules or []:
            self._rules[rule.hostname] = (
                [re.compile(p) for p in rule.allow],
                [re.compile(p) for p in rule.disallow],
            )

    def allow(self, root: str, path: str, url_string: str) -> bool:
        if BAD_EXTENSIONS_RE.search(path):
            return False
        rule = self._rules.get(root)
        if rule is None:
            rule = self._rules.get("*")
            if rule is None:
                return True
        allow_pats, disallow_pats = rule
        for pat in disallow_pats:
            if pat.search(url_string):
                return False
        for pat in allow_pats:
            if pat.search(url_string):
                return True
        return False  # default deny (filter.go:56)


def in_scope(parent_root: str, child_host: str, mode: str = "fidelity") -> bool:
    """Scope gate (``crawler.go:252``).

    fidelity: ``strings.Contains(child_host, parent_root)`` — substring
    containment, so ``notgo.dev`` "contains" ``go.dev`` and passes.
    strict: child host equals the parent root or ends with ``.<root>``.
    """
    if mode == "strict":
        return child_host == parent_root or child_host.endswith("." + parent_root)
    return parent_root in child_host
