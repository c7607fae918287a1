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
