"""Deterministic synthetic web corpus — the engine's simulated internet.

Generates Parquet pages tables in exactly the target input schema
(``url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string``), as a pure function of ``(seed, scale)``. The sandbox has no
network, so "fetching" a URL means looking it up in this corpus; the corpus
therefore embeds every trap case the reference's URL/filter semantics can
hit (see FIXTURES.md): scheme/www/trailing-slash/%-encoding duplicate
spellings, off-scope and substring-scope-quirk hosts, bad-extension assets,
chains deeper than max_depth, links back to the seed, links to URLs that
don't exist (fetch failures), and one oversized body whose tail links are
lost to truncation.

The invariant ``text == extract_text(html)`` holds by construction — the
generator uses the engine's canonical extractor — which is what makes
"byte-identical extracted text per url" testable end-to-end.
"""

from __future__ import annotations

import random
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from wbot_ray.html import extract_text

__all__ = ["gen_pages", "write_pages", "write_pages_sharded", "SCALES", "seeds_for_scale"]

# rows are approximate; the generator is deterministic for a given scale.
# "words" widens page bodies (Common-Crawl-ish pages are tens of KB; the
# conformance scales keep the small default so oracle runs stay fast).
SCALES = {
    "tiny": {"hosts": 3, "pages_per_host": 8, "hot_factor": 2},
    "small": {"hosts": 12, "pages_per_host": 40, "hot_factor": 6},
    "medium": {"hosts": 40, "pages_per_host": 120, "hot_factor": 10},
    "bench": {"hosts": 300, "pages_per_host": 600, "hot_factor": 5, "words": (4000, 8000)},
    # 4x the bench crawl's parallel work — built to test whether a
    # longer scaling job (amortizing per-round fixed latency like the
    # 100 TB operating point would) measures better pair efficiency.
    # It does NOT on this host (0.487 vs 0.850): the ~6 min of
    # sustained load drains the hypervisor's burst-credit bucket and
    # every long job converges to the credit baseline (~13-16
    # effective cores), capping any measured pair at ~0.4-0.5
    # regardless of plan. Kept for reproduction (`bench.py --scaling
    # --scale bench4x --seeds 600`) and as the only corpus big enough
    # to exercise the distributed (>local_round_threshold) round path
    # at bench fidelity. Same page/link generator, only more hosts x
    # pages.
    "bench4x": {"hosts": 600, "pages_per_host": 1200, "hot_factor": 5, "words": (4000, 8000)},
    # ~10x the bench crawl's PAGE COUNT (1500 hosts x 1200 pages =
    # 1.8M pages) with trimmed bodies (~8 KB) so corpus + index fit
    # the sandbox disk. The point is constants tuned at 177k pages —
    # block floors, hot-root salt thresholds, bucket counts, the
    # local/distributed plan crossover (rounds here clear
    # local_round_threshold, so the Dataset shuffle plan engages) —
    # not byte fidelity, which "bench"/"bench4x" keep.
    "bench10x": {"hosts": 1500, "pages_per_host": 1200, "hot_factor": 5, "words": (800, 1600)},
}

_BASE_TS = int(datetime(2024, 5, 1, tzinfo=timezone.utc).timestamp() * 1_000_000)

_WORDS = (
    "web crawl frontier page link host depth fetch parse extract stream "
    "arrow batch shuffle actor parquet index robot filter scope hash dedup "
    "round budget polite schedule lineage metric block spill queue seed"
).split()


def _page_text_words(
    rng: random.Random, hi: int, pj: int, words_range: tuple[int, int] = (12, 42)
) -> str:
    lo, hi_w = words_range
    n = lo + rng.randrange(max(1, hi_w - lo))
    words = [f"host{hi}", f"page{pj}"] + [rng.choice(_WORDS) for _ in range(n)]
    return " ".join(words)


def _host(i: int) -> str:
    return f"site{i}.com"


def _page_url(hi: int, pj: int) -> str:
    return f"https://site{hi}.com/p/{pj}"


def seeds_for_scale(scale: str, n: int = 3) -> list[str]:
    """Canonical seed list: roots of the first ``n`` hosts."""
    cfg = SCALES[scale] if isinstance(scale, str) else scale
    h = min(n, cfg["hosts"])
    return [f"https://site{i}.com/p/0" for i in range(h)]


def _links_for_page(
    rng: random.Random, hi: int, pj: int, n_pages: int, n_hosts: int
) -> tuple[list[str], list[str], list[str], list[str], list[str]]:
    """(a_hrefs, link_hrefs, img_srcs, script_srcs, iframe_srcs) for page
    (hi, pj) — deterministic, heavy on dedup/filter traps."""
    a: list[str] = []

    def tgt() -> int:
        return rng.randrange(n_pages)

    # plain intra-host links (the bulk of the graph)
    for _ in range(3 + rng.randrange(4)):
        a.append(f"/p/{tgt()}")
    # absolute same-host
    a.append(_page_url(hi, tgt()))
    # duplicate-spelling traps
    r = rng.random()
    if r < 0.5:
        a.append(f"http://site{hi}.com/p/{tgt()}")  # scheme variant (same hash)
    if r < 0.35:
        a.append(f"https://www.site{hi}.com/p/{tgt()}")  # www variant (same hash, fetch-miss)
    if r < 0.3:
        a.append(f"/p/{tgt()}/")  # trailing slash (same hash, fetch-miss)
    if r < 0.25:
        t = tgt()
        a.append(f"/p/{t}#section-{t}")  # fragment stripped -> same as /p/t
    if r < 0.2:
        a.append(f"/p/%25{50 + rng.randrange(8)}")  # double-encoded: %25XX -> %XX -> char
    if r < 0.15:
        a.append(f"/p%2F{tgt()}")  # single-encoded slash: own identity, fetch-miss
    # rejected / skipped candidates
    if r < 0.4:
        a.append("#top")  # pure fragment, rejected at resolve
    if r < 0.3:
        a.append("ftp://files.site0.com/x")  # invalid scheme
    if r < 0.25:
        a.append("https://example.invalidtld/x")  # invalid TLD
    if r < 0.2:
        a.append("https://example.com.xxy/")  # TLD "xxy" not allowed
    if r < 0.1:
        a.append("/bad%zz-escape")  # malformed escape -> NewURL error, silently skipped
    # off-scope cross-host
    a.append(f"https://site{(hi + 1 + rng.randrange(max(1, n_hosts - 1))) % n_hosts}.com/p/{tgt()}")
    # substring-scope quirk: notsite0.com contains "site0.com"
    if hi == 0 and rng.random() < 0.4:
        a.append(f"https://notsite0.com/p/{rng.randrange(4)}")
    # subdomain (in scope, mostly fetch-miss except the few real sub pages)
    if rng.random() < 0.2:
        a.append(f"https://sub.site{hi}.com/p/{rng.randrange(3)}")
    # link back to the seed page (seed re-crawl quirk)
    if rng.random() < 0.25:
        a.append(_page_url(hi, 0))
    # a URL that does not exist anywhere (fetch failure)
    if rng.random() < 0.3:
        a.append(f"/missing/{rng.randrange(10_000)}")
    # in-scope link with an extension NOT on the deny list (passes filter,
    # fetch-miss)
    if rng.random() < 0.15:
        a.append(f"/img/{tgt()}.webp")

    link_hrefs = [f"/css/style-{pj % 3}.css"]  # bad extension -> filtered
    img = [f"/img/{pj % 7}.png", f"/img/banner-{hi}.jpg"]  # filtered
    script = [f"/js/app-{pj % 5}.js"]  # filtered
    iframe = []
    if rng.random() < 0.3:
        iframe.append(f"/p/{tgt()}")  # iframe to a real page: passes filters

    # deep chain pages: /chain/k -> /chain/k+1 (exceeds any max_depth)
    if pj == 1:
        a.append(f"https://site{hi}.com/chain/0")
    return a, link_hrefs, img, script, iframe


def _render_html(
    title: str,
    text_words: str,
    groups: tuple[list[str], list[str], list[str], list[str], list[str]],
    pad: int = 0,
    tail_links: list[str] | None = None,
) -> bytes:
    a, link, img, script, iframe = groups
    parts = ["<!doctype html><html><head><title>", title, "</title>"]
    for href in link:
        parts.append(f'<link href="{href}" rel="stylesheet">')
    parts.append("</head><body>")
    parts.append(f"<h1>{title}</h1>")
    words = text_words.split()
    mid = len(words) // 2
    parts.append("<p>" + " ".join(words[:mid]) + "</p>")
    for i, href in enumerate(a):
        parts.append(f'<a href="{href}">l{i}</a>')
    parts.append("<p>" + " ".join(words[mid:]) + "</p>")
    for src in img:
        parts.append(f'<img src="{src}">')
    for src in script:
        parts.append(f'<script src="{src}"></script>')
    for src in iframe:
        parts.append(f'<iframe src="{src}"></iframe>')
    if pad:
        parts.append("<!-- " + "x" * pad + " -->")
    for i, href in enumerate(tail_links or []):
        parts.append(f'<a href="{href}">tail{i}</a>')
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


_LANG_CYCLE = ("en", "de", "fr", "es", "en", "en", "pt", "it")


class _Emitter:
    """Accumulates page rows; ``k`` is the GLOBAL page ordinal (drives
    ``warc_ts``/``lang``), passed in so per-host shards generated on
    different workers still produce exactly the rows the sequential
    generator would."""

    def __init__(self) -> None:
        self.urls: list[str] = []
        self.htmls: list[bytes] = []
        self.texts: list[str] = []
        self.langs: list[str] = []
        self.tss: list[int] = []

    def emit(self, url: str, html: bytes, k: int) -> None:
        self.urls.append(url)
        self.htmls.append(html)
        self.texts.append(extract_text(html))
        self.langs.append(_LANG_CYCLE[k % len(_LANG_CYCLE)])
        self.tss.append(_BASE_TS + k * 1_000_000)

    def table(self) -> pa.Table:
        return pa.table(
            {
                "url": pa.array(self.urls, pa.string()),
                "warc_ts": pa.array(self.tss, pa.timestamp("us")),
                "html": pa.array(self.htmls, pa.binary()),
                "text": pa.array(self.texts, pa.string()),
                "lang": pa.array(self.langs, pa.string()),
            }
        )


def _host_page_count(cfg: dict, hi: int) -> int:
    return cfg["pages_per_host"] * (cfg["hot_factor"] if hi == 0 else 1) + 25  # + chain


def _gen_host(cfg: dict, hi: int, k_start: int, seed: int) -> pa.Table:
    """All pages of host ``hi`` (regular + chain). Pure function of
    (cfg, hi, k_start, seed) — host shards parallelize embarrassingly."""
    n_hosts = cfg["hosts"]
    per_host = cfg["pages_per_host"]
    hot = cfg["hot_factor"]
    words_range = tuple(cfg.get("words", (12, 42)))
    em = _Emitter()
    k = k_start
    n_pages = per_host * (hot if hi == 0 else 1)
    rng = random.Random(f"{seed}:host:{hi}")
    for pj in range(n_pages):
        groups = _links_for_page(rng, hi, pj, n_pages, n_hosts)
        pad, tail = 0, None
        if hi == 0 and pj == 2:
            # oversized page: tail links beyond any small max_body_size
            pad = 64 * 1024
            tail = [f"/p/{(pj + 5) % n_pages}", "/only-in-tail"]
        html = _render_html(f"site{hi} page {pj}", _page_text_words(rng, hi, pj, words_range), groups, pad, tail)
        em.emit(_page_url(hi, pj), html, k)
        k += 1
    # deep chain (length 2*max_depth-ish, plenty)
    for cj in range(25):
        html = _render_html(
            f"site{hi} chain {cj}",
            _page_text_words(rng, hi, 10_000 + cj, words_range),
            ([f"/chain/{cj + 1}"], [], [], [], []),
        )
        em.emit(f"https://site{hi}.com/chain/{cj}", html, k)
        k += 1
    return em.table()


def _gen_extras(cfg: dict, k_start: int, seed: int) -> pa.Table:
    """The scope-quirk host + subdomain pages (fixed tail of the corpus)."""
    em = _Emitter()
    k = k_start
    # substring-scope-quirk host (crawlable from site0 in fidelity mode)
    rng = random.Random(f"{seed}:notsite0")
    for pj in range(4):
        html = _render_html(
            f"notsite0 page {pj}",
            _page_text_words(rng, 990, pj),
            ([f"/p/{(pj + 1) % 4}", "https://site0.com/p/1"], [], [], [], []),
        )
        em.emit(f"https://notsite0.com/p/{pj}", html, k)
        k += 1
    # a few real subdomain pages for sub.site0.com
    rng = random.Random(f"{seed}:sub0")
    for pj in range(3):
        html = _render_html(
            f"sub.site0 page {pj}",
            _page_text_words(rng, 991, pj),
            ([f"/p/{(pj + 1) % 3}", "https://site0.com/p/2"], [], [], [], []),
        )
        em.emit(f"https://sub.site0.com/p/{pj}", html, k)
        k += 1
    return em.table()


def gen_pages(scale: str | dict = "tiny", seed: int = 42) -> pa.Table:
    """Build the full pages table for a scale. Deterministic in (seed, scale)."""
    cfg = SCALES[scale] if isinstance(scale, str) else scale
    tables = []
    k = 0
    for hi in range(cfg["hosts"]):
        tables.append(_gen_host(cfg, hi, k, seed))
        k += _host_page_count(cfg, hi)
    tables.append(_gen_extras(cfg, k, seed))
    return pa.concat_tables(tables)


def write_pages(path: str, scale: str | dict = "tiny", seed: int = 42, row_group_size: int = 2048) -> str:
    """Write the pages table to one Parquet file; returns the path."""
    table = gen_pages(scale, seed)
    pq.write_table(table, path, row_group_size=row_group_size)
    return path


def write_pages_sharded(
    out_dir: str, scale: str | dict, seed: int = 42, row_group_size: int = 2048
) -> str:
    """Parallel corpus generation: one Ray task per host, writing
    ``out_dir/host-<hi>.parquet`` shards. Row-for-row identical content
    to ``gen_pages`` (per-host RNG streams + closed-form global
    ordinals), built in wall-time ≈ slowest host instead of the whole
    corpus. Requires an initialised Ray; returns ``out_dir`` (readable
    as one parquet dataset)."""
    import os

    import ray

    cfg = SCALES[scale] if isinstance(scale, str) else scale
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def shard(hi: int, k_start: int) -> None:
        t = _gen_host(cfg, hi, k_start, seed)
        tmp = os.path.join(out_dir, f".host-{hi:05d}.tmp")
        pq.write_table(t, tmp, row_group_size=row_group_size)
        os.replace(tmp, os.path.join(out_dir, f"host-{hi:05d}.parquet"))

    refs, k = [], 0
    for hi in range(cfg["hosts"]):
        refs.append(shard.remote(hi, k))
        k += _host_page_count(cfg, hi)
    pq.write_table(_gen_extras(cfg, k, seed), os.path.join(out_dir, "extras.parquet"))
    ray.get(refs)
    with open(done, "w") as f:
        f.write("ok")
    return out_dir
