"""find_links grouped-order semantics (wbot.go:165-197) + extract_text."""

from wbot_ray.html import extract_text, find_links

PAGE = b"""<!doctype html>
<html><head>
<link href="/style-late.css">
<script src="/early.js"></script>
</head><body>
<p>Hello <b>world</b></p>
<a href="/first">one</a>
<img src="/img1.png">
<a href="/second">two</a>
<iframe src="/frame"></iframe>
<link href="/style2.css">
<script src="/late.js"></script>
<img src="/img2.png"/>
</body></html>
"""


def test_grouped_selector_order():
    # all a[href] first (doc order), then link[href], img[src], script[src],
    # iframe[src] — mirroring the reference's five .Find().Each() passes.
    assert find_links(PAGE) == [
        "/first",
        "/second",
        "/style-late.css",
        "/style2.css",
        "/img1.png",
        "/img2.png",
        "/early.js",
        "/late.js",
        "/frame",
    ]


def test_attr_presence_required():
    assert find_links(b'<a>no href</a><a href="">empty</a>') == [""]


def test_duplicate_attr_first_wins():
    assert find_links(b'<a href="/a" href="/b">x</a>') == ["/a"]


def test_truncated_html_is_best_effort():
    # body sliced mid-tag still yields the links fully seen before the cut
    body = b'<a href="/ok">x</a><a href="/cut'
    assert find_links(body) == ["/ok"]


def test_extract_text_basic():
    assert extract_text(PAGE) == "Hello world one two"


def test_extract_text_skips_script_style():
    body = b"<p>keep</p><script>var x=1;</script><style>p{}</style><p>also</p>"
    assert extract_text(body) == "keep also"


def test_extract_text_whitespace_normalized():
    body = b"<p>  a \n\t b  </p><div>c</div>"
    assert extract_text(body) == "a b c"


def test_extract_text_entities():
    assert extract_text(b"<p>a &amp; b</p>") == "a & b"


class TestParsePage:
    def test_one_pass_equals_two_passes(self):
        """parse_page (the fetch hot path) must be byte-identical to the
        separate find_links + extract_text reference implementations —
        including truncated input, self-closed skip tags, and nested
        script/style."""
        from wbot_ray.html import extract_text, find_links, parse_page

        bodies = [
            b"<html><body><a href='/x'>A</a><script>var x=1</script>text"
            b"<img src='i.png'/><style>p{}</style> tail</body></html>",
            b"<a href='/1'><link href='/2'><script src='/3'></script>"
            b"<iframe src='/4'></iframe><noscript>hidden</noscript>shown",
            b"<script/>visible<script>skip<style>nested</style>more</script>out",
            b"<p>unclosed <a href='/t'>trunc",
            b"",
            "<p>unicode é中</p><a href='/u'>x</a>".encode(),
            b"<p>bad \xff bytes</p><a href='/b'>y</a>",
        ]
        from wbot_ray.sources.fixtures import gen_pages

        bodies += [h.encode() if isinstance(h, str) else h
                   for h in gen_pages("tiny").column("html").to_pylist()[:50]]
        for body in bodies:
            if isinstance(body, str):
                body = body.encode()
            links, text = parse_page(body)
            assert links == find_links(body), body[:60]
            assert text == extract_text(body), body[:60]

    def test_one_pass_on_truncated_prefixes(self):
        from wbot_ray.html import extract_text, find_links, parse_page
        from wbot_ray.sources.fixtures import gen_pages

        html = gen_pages("tiny").column("html").to_pylist()[0]
        body = html.encode() if isinstance(html, str) else html
        for cut in (0, 1, 7, 63, 128, 1000, len(body)):
            b = body[:cut]
            assert parse_page(b) == (find_links(b), extract_text(b)), cut


class TestFindAnchors:
    def test_basic_pairs_in_document_order(self):
        from wbot_ray.html import find_anchors

        body = (
            b"<a href='/a'>first</a><p>between</p>"
            b"<a href='/b'>two  words</a><a href='/a'>first</a>"
        )
        assert find_anchors(body) == [
            ("/a", "first"), ("/b", "two words"), ("/a", "first"),
        ]

    def test_no_href_skipped_and_duplicate_attr_first_wins(self):
        from wbot_ray.html import find_anchors

        assert find_anchors(b"<a name='n'>skip</a><a href='/1' href='/2'>t</a>") == [
            ("/1", "t")
        ]

    def test_new_anchor_implicitly_closes_open_one(self):
        from wbot_ray.html import find_anchors

        # HTML5 in-body rule: browsers never nest anchors
        body = b"<a href='/x'>outer <a href='/y'>inner</a> tail"
        assert find_anchors(body) == [("/x", "outer"), ("/y", "inner")]

    def test_self_closed_empty_text_and_truncation_flush(self):
        from wbot_ray.html import find_anchors

        assert find_anchors(b"<a href='/s'/>rest") == [("/s", "")]
        assert find_anchors(b"<a href='/t'>cut off mid") == [("/t", "cut off mid")]

    def test_inner_text_matches_extract_text_definition(self):
        from wbot_ray.html import find_anchors

        body = (
            b"<a href='/k'>keep <b>bold</b><script>var x=1</script>"
            b"<style>p{}</style> after&amp;amp</a>"
        )
        assert find_anchors(body) == [("/k", "keep bold after&amp")]

    def test_empty_and_invalid_bytes(self):
        from wbot_ray.html import find_anchors

        assert find_anchors(b"") == []
        assert find_anchors(b"<a href='/b'>y\xff z</a>") == [("/b", "y� z")]

    def test_hrefs_agree_with_find_links_a_group(self):
        """find_anchors' href sequence == find_links' a[href] group on
        real fixture pages (same collection rule, one more column)."""
        from wbot_ray.html import find_anchors, find_links
        from wbot_ray.sources.fixtures import gen_pages

        for html in gen_pages("tiny").column("html").to_pylist()[:40]:
            body = html.encode() if isinstance(html, str) else html
            hrefs = [h for h, _ in find_anchors(body)]
            # the a[href] group is the PREFIX of find_links' grouped order
            assert find_links(body)[: len(hrefs)] == hrefs
