"""HTML link extraction and canonical text extraction.

``find_links`` replicates the reference's goquery extraction
(``/root/reference/pkg/api/wbot.go:165-197``): five selector groups, each
collected in document order, concatenated in the fixed group order
``a[href]``, ``link[href]``, ``img[src]``, ``script[src]``, ``iframe[src]``.
This grouped order feeds ``link_idx`` → ``ord_path`` → crawl order, so it is
part of the engine's determinism contract.

``extract_text`` is the engine's single canonical HTML→text function (the
reference never extracts text — its ``Response.Body`` is raw bytes — but the
target data model requires byte-identical extracted text per URL; fixtures
and engine share exactly this implementation, making the invariant testable).

Both are pure functions over ``bytes`` — called from vectorized
``map_batches`` UDFs; the parser is Python's incremental ``HTMLParser``
(no tree build, single pass, tolerant of truncated input — important because
the body is sliced to ``max_body_size`` *before* extraction, matching
``io.CopyN`` truncation at ``http_client.go:117``).
"""

from __future__ import annotations

from html.parser import HTMLParser

__all__ = ["find_links", "find_anchors", "extract_text", "parse_page"]

# tag -> attribute, in the reference's selector-group order (wbot.go:171-195)
_GROUPS: tuple[tuple[str, str], ...] = (
    ("a", "href"),
    ("link", "href"),
    ("img", "src"),
    ("script", "src"),
    ("iframe", "src"),
)
_GROUP_IDX = {tag: i for i, (tag, _attr) in enumerate(_GROUPS)}


class _LinkCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.groups: list[list[str]] = [[] for _ in _GROUPS]

    def _collect(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        gi = _GROUP_IDX.get(tag)
        if gi is None:
            return
        want = _GROUPS[gi][1]
        # first occurrence wins, like net/html's duplicate-attribute handling
        for name, value in attrs:
            if name == want:
                if value is not None:
                    self.groups[gi].append(value)
                return

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self._collect(tag, attrs)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self._collect(tag, attrs)


def find_links(body: bytes) -> list[str]:
    """All candidate hrefs/srcs in the body, grouped by selector in the
    reference's order, document order within each group. Parse errors yield
    whatever was collected so far (goquery never errors on truncated HTML
    either — it builds a best-effort tree)."""
    p = _LinkCollector()
    try:
        p.feed(body.decode("utf-8", "replace"))
        p.close()
    except Exception:
        pass
    out: list[str] = []
    for g in p.groups:
        out.extend(g)
    return out


class _AnchorCollector(HTMLParser):
    """``(href, inner text)`` per ``<a href>`` element, document order.

    Semantics (pinned by ``tests/test_html.py``):

    * only ``<a>`` elements whose FIRST ``href`` attribute is present
      (first occurrence wins, like ``_LinkCollector``);
    * a new ``<a>`` start tag implicitly closes any open anchor — the
      HTML5 in-body insertion rule (browsers never nest anchors);
    * inner text follows ``extract_text``'s definition: text nodes
      outside script/style/template/noscript, whitespace-normalized,
      space-joined — so an anchor's text is exactly the slice of the
      page text it contributes;
    * ``<a href=x/>`` (self-closed) yields ``(x, "")``; an anchor left
      open at EOF (truncated body) flushes with what it collected.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.anchors: list[tuple[str, str]] = []
        self._href: str | None = None
        self._chunks: list[str] = []
        self._skip_depth = 0

    def _flush(self) -> None:
        if self._href is not None:
            # one split over the joined raw chunks == concatenating
            # per-chunk splits (the "\n" separator only breaks tokens at
            # chunk boundaries, where a per-chunk split breaks anyway)
            self.anchors.append((self._href, " ".join("\n".join(self._chunks).split())))
        self._href, self._chunks = None, []

    @staticmethod
    def _first_href(attrs: list[tuple[str, str | None]]) -> str | None:
        for name, value in attrs:
            if name == "href":
                return value
        return None

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag == "a":
            self._flush()
            self._href = self._first_href(attrs)
        elif tag in _SKIP_TEXT_TAGS and tag not in _VOID:
            self._skip_depth += 1

    def handle_startendtag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag == "a":
            self._flush()
            href = self._first_href(attrs)
            if href is not None:
                self.anchors.append((href, ""))

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._flush()
        elif tag in _SKIP_TEXT_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._href is None or self._skip_depth:
            return
        self._chunks.append(data)


def find_anchors(body: bytes) -> list[tuple[str, str]]:
    """``(href, anchor text)`` pairs for the body's ``<a href>``
    elements, document order — the per-page fact behind anchor-text
    aggregation (what search indexes store per target URL). Parse
    errors yield whatever was collected so far, like ``find_links``."""
    p = _AnchorCollector()
    try:
        p.feed(body.decode("utf-8", "replace"))
        p.close()
    except Exception:
        pass
    p._flush()
    return p.anchors


_SKIP_TEXT_TAGS = frozenset({"script", "style", "template", "noscript"})
# void elements never pushed on the skip stack
_VOID = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input",
     "link", "meta", "param", "source", "track", "wbr"}
)


class _TextCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIP_TEXT_TAGS and tag not in _VOID:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TEXT_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        # raw chunk; tokenized ONCE at the end (identical result: the
        # "\n" join separator only breaks tokens at chunk boundaries,
        # where a per-chunk split breaks anyway — and it is ~2x faster
        # than per-word list appends on 40 KB bodies)
        self.chunks.append(data)


def extract_text(body: bytes) -> str:
    """Canonical deterministic HTML→text: text nodes outside
    script/style/template/noscript, whitespace-normalized (every run of
    whitespace collapses to a single space), joined with single spaces."""
    p = _TextCollector()
    try:
        p.feed(body.decode("utf-8", "replace"))
        p.close()
    except Exception:
        pass
    return " ".join("\n".join(p.chunks).split())


class _PageCollector(HTMLParser):
    """Links + text in ONE parse (the fetch hot path). Semantically the
    exact union of ``_LinkCollector`` and ``_TextCollector``: the two
    callbacks never interact (link collection reads start tags; the text
    skip-stack reads start/end tags), so one pass produces byte-identical
    outputs to the two separate passes — pinned by
    ``tests/test_html.py``. A self-closed skip tag (``<script/>``) is a
    net no-op on the skip depth, matching ``_TextCollector``'s default
    ``handle_startendtag`` (+1 then −1)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.groups: list[list[str]] = [[] for _ in _GROUPS]
        self.chunks: list[str] = []
        self._skip_depth = 0

    def _collect(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        gi = _GROUP_IDX.get(tag)
        if gi is None:
            return
        want = _GROUPS[gi][1]
        for name, value in attrs:
            if name == want:
                if value is not None:
                    self.groups[gi].append(value)
                return

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self._collect(tag, attrs)
        if tag in _SKIP_TEXT_TAGS and tag not in _VOID:
            self._skip_depth += 1

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self._collect(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TEXT_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        self.chunks.append(data)  # raw chunk; tokenized once at the end


def parse_page(body: bytes) -> tuple[list[str], str]:
    """``(find_links(body), extract_text(body))`` in a single parse +
    single decode — the fetch stage's hot call. The split functions stay
    the oracle-side reference implementations."""
    p = _PageCollector()
    try:
        p.feed(body.decode("utf-8", "replace"))
        p.close()
    except Exception:
        pass
    links: list[str] = []
    for g in p.groups:
        links.extend(g)
    return links, " ".join("\n".join(p.chunks).split())
