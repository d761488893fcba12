"""Anchor-text / link-graph layer over the pages corpus.

The reference's ``inlink`` field is ClueWeb's anchor-text field: the text of
inbound links, indexed as if it were document content
(/root/reference/QryEval/QryParser.java:159-163 lists the field;
InspectIndex.java:286-333 prints its per-field stats like any other field).
ClueWeb ships the field pre-computed; at crawl scale *we* are the ones who
must compute it, which is a classic web-scale propagation job:

    parse <a href> doc-locally  ->  resolve to target url  ->  aggregate
    anchor text per TARGET      ->  index it as the target's inlink field.

Scale shape (10^12 pages, 10^13 raw links):

- ``extract_links`` is one stateless ``mapInPandas`` pass over the html —
  no shuffle, html bytes never move. Output rows are narrow (three short
  strings), ~100x smaller than the pages.
- ``anchor_texts`` is where skew lives: a celebrity page has 10^8 inbound
  links, a mirror farm repeats one anchor from one host 10^6 times. The
  discipline here mirrors web-search practice (anchor votes are counted
  per linking HOST, not per link):
    1. dedup (dst, src_host, anchor)            — one distinct, map-side
    2. cap anchors per (dst, src_host)          — kills single-host spam
    3. weight = #distinct hosts per (dst, anchor)
    4. two-level top-N per dst (hash-bucketed pre-cap, then global) —
       the window input for a mega-dst is bounded by buckets x N, never
       by its raw in-degree.
  Every step is a narrow groupBy/window with map-side combine; nothing is
  ever O(in-degree) in one task.
- ``host_graph`` collapses the same links to the (src_host, dst_host, w)
  edge list that feeds ``analytic.pagerank`` — 10^13 raw links shrink to
  ~10^8 host pairs in one groupBy before any iteration.

``index.build.build_index(..., anchors=...)`` joins the aggregated anchor
text onto the pages by url (broadcast under the same byte-gate as the docid
join; co-partitioned storage on url at cluster scale) and the tokenize
kernel indexes it as the ``inlink`` field in place of any in-page stand-in.
"""

from __future__ import annotations

import html as _htmllib
import re
from urllib.parse import urljoin, urldefrag

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .tokenizer import _WS_RE

# href must follow whitespace (lookbehind) so data-href/xhref never match;
# Tag scanners + an order-insensitive attribute parser: real crawl html
# puts attributes in any order (content-before-name metas, href-before-rel
# links), quotes them with ", ', or nothing, and nests things like
# 'rel=nofollow' INSIDE other attributes' quoted values. _attrs consumes
# attributes left-to-right non-overlapping, so a quoted value is swallowed
# whole and its contents can never masquerade as a separate attribute.
_A_RE = re.compile(rb"<a\s([^>]*)>(.*?)</a\s*>", re.S | re.I)
_META_TAG_RE = re.compile(rb"<meta\s[^>]*>", re.I)
_LINK_TAG_RE = re.compile(rb"<link\s[^>]*>", re.I)
_ATTR_RE = re.compile(
    rb"(?<=\s)([a-zA-Z][a-zA-Z0-9_-]*)\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]*)")
_MARKUP_RE = re.compile(r"<[^>]*>")


def _attrs(blob: bytes) -> dict[bytes, bytes]:
    """Attribute blob -> {name(lower): value(unquoted)}; first wins."""
    out: dict[bytes, bytes] = {}
    for m in _ATTR_RE.finditer(b" " + blob):
        v = m.group(2)
        if v[:1] in (b'"', b"'"):
            v = v[1:-1]
        out.setdefault(m.group(1).lower(), v)
    return out


def _rel_tokens(attrs: dict[bytes, bytes], key: bytes = b"rel") -> set[bytes]:
    return set(re.split(rb"[\s,]+", attrs.get(key, b"").lower())) - {b""}


def _page_nofollow(hb: bytes) -> bool:
    """<meta name="robots" content="... nofollow ..."> in either attribute
    order suppresses every outlink vote of the page (Google's original
    anchor-spam countermeasure; honoring it is the crawl-correct default
    for anchor_texts and host_graph/pagerank alike)."""
    for t in _META_TAG_RE.finditer(hb):
        a = _attrs(t.group(0)[5:])
        if (a.get(b"name", b"").lower() == b"robots"
                and b"nofollow" in _rel_tokens(a, b"content")):
            return True
    return False

LINKS_SCHEMA = T.StructType([
    T.StructField("src", T.StringType(), False),
    T.StructField("dst", T.StringType(), False),
    T.StructField("anchor", T.StringType(), False),
])


def _clean_anchor(raw: bytes) -> str:
    s = _MARKUP_RE.sub(" ", raw.decode("utf-8", errors="replace"))
    s = _htmllib.unescape(s)
    return _WS_RE.sub(" ", s).strip()


def extract_links(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) -> (src, dst, anchor): one stateless pass,
    doc-local href parse + relative-url resolution. Drops self-links,
    fragment-only links, non-http(s) schemes and empty anchors."""

    def parse(batches):
        for pdf in batches:
            out_src, out_dst, out_anchor = [], [], []
            for src, html in zip(pdf["src"], pdf["html"]):
                hb = bytes(html) if html is not None else b""
                if _page_nofollow(hb):
                    continue  # page-level robots nofollow: no votes at all
                for m in _A_RE.finditer(hb):
                    a = _attrs(m.group(1))
                    if b"nofollow" in _rel_tokens(a):
                        continue  # rel=nofollow link: passes no vote
                    href = a.get(b"href", b"").decode(
                        "utf-8", errors="replace").strip()
                    if not href:
                        continue
                    dst = urldefrag(urljoin(src, href))[0]
                    if not dst.startswith(("http://", "https://")) or dst == src:
                        continue
                    anchor = _clean_anchor(m.group(2))
                    if not anchor:
                        continue
                    out_src.append(src)
                    out_dst.append(dst)
                    out_anchor.append(anchor)
            yield pd.DataFrame({"src": out_src, "dst": out_dst,
                                "anchor": out_anchor})

    return pages.select(F.col("url").alias("src"), "html") \
        .mapInPandas(parse, LINKS_SCHEMA)


def canonical_map(pages: DataFrame) -> DataFrame:
    """pages -> (alias, canonical) from <link rel="canonical"> declarations
    (self-canonical pages emit no row). One stateless pass, like
    extract_links."""

    def parse(batches):
        for pdf in batches:
            al, cn = [], []
            for url, html in zip(pdf["alias"], pdf["html"]):
                hb = bytes(html) if html is not None else b""
                for t in _LINK_TAG_RE.finditer(hb):
                    a = _attrs(t.group(0)[5:])
                    if b"canonical" not in _rel_tokens(a):
                        continue
                    href = a.get(b"href", b"").decode(
                        "utf-8", errors="replace").strip()
                    if not href:
                        continue
                    canon = urldefrag(urljoin(url, href))[0]
                    if (canon.startswith(("http://", "https://"))
                            and canon != url):
                        al.append(url)
                        cn.append(canon)
                    break  # first canonical declaration wins
            yield pd.DataFrame({"alias": al, "canonical": cn})

    schema = T.StructType([T.StructField("alias", T.StringType(), False),
                           T.StructField("canonical", T.StringType(), False)])
    return pages.select(F.col("url").alias("alias"), "html") \
        .mapInPandas(parse, schema)


def resolve_canonical(links: DataFrame, canon: DataFrame) -> DataFrame:
    """Redirect link targets through the canonical map: a vote for a known
    alias counts for its canonical url (mirror/tracking-param variants stop
    splitting a page's anchor profile and PageRank mass). One equi-join on
    dst of two narrow tables (links are 3 short strings, the map is one row
    per declared alias — both co-partitionable on url at crawl scale);
    unmapped dsts pass through. Single-hop by design: canonical chains are
    a crawl-quality defect real pipelines clamp to one hop too."""
    c = canon.select(F.col("alias").alias("dst"), "canonical")
    return (links.join(c, "dst", "left")
            .select("src",
                    F.coalesce("canonical", F.col("dst")).alias("dst"),
                    "anchor")
            .filter(F.col("src") != F.col("dst")))


def link_votes(links: DataFrame) -> DataFrame:
    """(src, dst, anchor) -> distinct (dst, src_host, anchor) votes — one
    vote per linking HOST per anchor string (web-search anchor counting)."""
    return links.select(
        F.col("dst"),
        F.parse_url(F.col("src"), F.lit("HOST")).alias("src_host"),
        F.col("anchor"),
    ).filter(F.col("src_host").isNotNull()).distinct()


def aggregate_votes(votes: DataFrame, max_anchors: int = 32,
                    per_host_cap: int = 4, buckets: int = 64) -> DataFrame:
    """Distinct (dst, src_host, anchor) votes -> (url, inlink). The
    aggregation core shared by the batch path (anchor_texts) and the
    streaming maintainer (streaming.stream_anchor_votes), so both produce
    byte-identical inlink text for the same vote set."""
    # 2. at most per_host_cap distinct anchors counted from any one host
    w_host = Window.partitionBy("dst", "src_host").orderBy(F.asc("anchor"))
    capped = (votes.withColumn("hr", F.row_number().over(w_host))
              .filter(F.col("hr") <= per_host_cap).drop("hr"))

    # 3. anchor weight = number of distinct linking hosts
    weighted = capped.groupBy("dst", "anchor").agg(
        F.count(F.lit(1)).cast("long").alias("n_hosts"))

    # 4. two-level top-N: pre-cap within hash buckets of the anchor space so
    # the final per-dst window never sees more than buckets * max_anchors
    # rows even for a 10^8-in-degree dst
    order = [F.desc("n_hosts"), F.asc("anchor")]
    w_pre = Window.partitionBy(
        "dst", F.pmod(F.xxhash64("anchor"), F.lit(buckets))).orderBy(*order)
    pre = (weighted.withColumn("pr", F.row_number().over(w_pre))
           .filter(F.col("pr") <= max_anchors).drop("pr"))
    w_dst = Window.partitionBy("dst").orderBy(*order)
    top = (pre.withColumn("r", F.row_number().over(w_dst))
           .filter(F.col("r") <= max_anchors))

    # deterministic concat in (n_hosts desc, anchor asc) order
    return (top.groupBy("dst")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(
                        (-F.col("n_hosts")).alias("neg_w"),
                        F.col("anchor").alias("anchor")))),
                    lambda s: s.getField("anchor")),
                " ").alias("inlink"))
            .withColumnRenamed("dst", "url"))


def anchor_texts(links: DataFrame, max_anchors: int = 32,
                 per_host_cap: int = 4, buckets: int = 64) -> DataFrame:
    """(src, dst, anchor) -> (url, inlink): the aggregated anchor-text field
    per target page, host-vote weighted, spam/skew capped (see module doc).
    Deterministic: anchors ordered by (#hosts desc, anchor asc), joined by
    single spaces."""
    return aggregate_votes(link_votes(links), max_anchors=max_anchors,
                           per_host_cap=per_host_cap, buckets=buckets)


def url_priors(pages: DataFrame, links: DataFrame,
               iters: int = 5, damp: float = 0.85,
               granularity: str = "host") -> DataFrame:
    """(url, page_rank) per page: weighted PageRank over the real-href
    link graph, the crawl-graph prior the reference stores as the per-doc
    PageRank attribute (Idx.getAttribute, LTR feature f4).

    granularity="host" (default): rank the collapsed host graph and map
    each page to its host's rank — the standard crawl-scale choice
    (10^12 urls collapse to ~10^8 hosts BEFORE any iteration; every page
    of a host shares the prior). granularity="url": the same pagerank()
    call on the un-collapsed url->url graph (url_graph below) joined back
    per page — per-document ranks like the reference's attribute, at the
    cost of iterating over the full url node set. Cost crossover: host
    iterations touch O(#hosts) nodes / O(#host-pairs) edges, url
    iterations O(#urls) / O(#distinct url links) — roughly four orders of
    magnitude more at crawl scale — so pay for url granularity only when
    the ranking workload actually consumes per-document priors (e.g. LTR
    f4 on a fine-grained crawl slice).

    TOTAL over the pages frame (every page with a parseable node key gets
    a row): nodes outside the link graph (isolated / only-internal-linking
    hosts, never-linked urls) get the teleport floor (1-damp)/n — the rank
    a no-inlink node would earn — never 0 and never the stand-in fallback,
    so one index never mixes graph ranks with stand-in noise. Scaled x1000
    into the reference attribute's typical magnitude."""
    from .analytic import pagerank

    if granularity == "url":
        pr = pagerank(url_graph(links), iters=iters, damp=damp)
        keyed = pages.select("url", F.col("url").alias("node"))
    elif granularity == "host":
        pr = pagerank(host_graph(links), iters=iters, damp=damp)
        keyed = (pages.select(
            "url", F.parse_url(F.col("url"), F.lit("HOST")).alias("node"))
            .filter(F.col("node").isNotNull()))
    else:
        raise ValueError(f"granularity must be 'host' or 'url', got {granularity!r}")
    # pagerank() already counted the node set; fall back to counting the
    # (checkpointed, 1-row-per-node) frame only if the stash is absent.
    # None-sentinel, not falsy: an empty graph legitimately stashes 0 and
    # must not trigger a redundant count of the empty frame.
    n = getattr(pr, "_pagerank_n_nodes", None)
    if n is None:
        n = pr.count()
    n = max(1, n)
    floor = (1.0 - damp) / n
    return (keyed.join(pr, "node", "left")
            .select("url",
                    (F.coalesce(F.col("pr"), F.lit(floor)) * 1000.0)
                    .alias("page_rank")))


def one_anchor_row_per_url(anchors: DataFrame) -> DataFrame:
    """Normalize an anchors frame to ONE (url, inlink) row per url — the
    contract every index path joins on (build/append/upsert/refresh join
    pages to anchors by url; duplicate urls would duplicate page rows and
    silently index inflated tf/df postings). Reading a streaming delta
    directory (stream_anchor_votes' out_dir) across epoch partitions yields
    one row per url PER EPOCH: when an `epoch` column is present the latest
    epoch wins (the documented delta semantics); otherwise ties break on
    inlink desc — a deterministic pick that is a no-op on an already-unique
    frame. One narrow window over (url) on a urls-sized table."""
    order = ([F.desc("epoch")] if "epoch" in anchors.columns else []) + \
        [F.desc("inlink")]
    w = Window.partitionBy("url").orderBy(*order)
    return (anchors.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") == 1).select("url", "inlink"))


def links_from_pages(pages: DataFrame) -> DataFrame:
    """The crawl-correct link derivation: extract (nofollow-honoring) ->
    redirect through the canonical map. Shared by anchor aggregation and
    the graph/priors path; materialize the result once when running both
    over the same corpus (both deployment commands accept raw pages and
    parse independently — at crawl scale write this table and reuse it)."""
    return resolve_canonical(extract_links(pages), canonical_map(pages))


def anchor_texts_from_pages(pages: DataFrame, **kw) -> DataFrame:
    """The full crawl-correct anchor pipeline in one call: extract links
    (nofollow-honoring) -> redirect votes through the canonical map ->
    aggregate. This is what the deployment drivers run; compose the pieces
    yourself when links/canonical state comes from elsewhere (e.g. the
    streaming vote store)."""
    return anchor_texts(links_from_pages(pages), **kw)


def url_graph(links: DataFrame) -> DataFrame:
    """(src, dst, anchor) -> (src, dst, w) UN-collapsed url->url edge list,
    w = 1 per distinct (src, dst) pair (anchor multiplicity is an anchor
    signal, not a rank signal — one page voting for another counts once,
    matching how host_graph counts distinct link events after its own
    collapse). One distinct with map-side combine; node space is the url
    space, so feed this to pagerank only when the workload pays for
    per-document granularity (see url_priors)."""
    return (links.select("src", "dst").filter(F.col("src") != F.col("dst"))
            .distinct().withColumn("w", F.lit(1.0)))


def host_graph(links: DataFrame) -> DataFrame:
    """(src, dst, anchor) -> (src, dst, w) collapsed host->host edge list
    (cross-host edges only) — the input shape of ``analytic.pagerank``.
    One groupBy with map-side combine: 10^13 raw links -> ~10^8 host pairs
    before any rank iteration touches them."""
    hosts = links.select(
        F.parse_url(F.col("src"), F.lit("HOST")).alias("src"),
        F.parse_url(F.col("dst"), F.lit("HOST")).alias("dst"),
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull()
             & (F.col("src") != F.col("dst")))
    return hosts.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("double").alias("w"))
