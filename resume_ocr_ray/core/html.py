"""HTML main-content extraction: boilerplate strip via DOM heuristics.

The north rule names "HTML boilerplate strip, PDF/layout parse, DOM
heuristics" as the extraction pipeline's responsibilities; the reference
only ever sees PDFs/images (ocr_service.py:20-127), so this module is the
HTML arm of the same engine, built from scratch on public readability-style
heuristics:

- parse with the stdlib ``html.parser`` into a small block tree,
- drop non-content subtrees outright (``script``/``style``/``head``,
  structural boilerplate tags ``nav``/``header``/``footer``/``aside``, and
  class/id keyword matches like ``sidebar``/``ad``/``banner``),
- score every remaining block node by text mass × (1 − link density)²
  (link-heavy nodes are navigation even when unmarked),
- return the SMALLEST node within 5% of the best score (most specific
  container), paragraphs joined with a blank line.

Whitespace inside text nodes is preserved verbatim (no HTML whitespace
collapsing): the synthetic crawl pages built by ``wrap_page`` carry the
source text raw inside ``<p>`` tags, so extraction is exact and the driver
can oracle-check ``main_text == documents.text`` value-for-value.
"""

from __future__ import annotations

import html as _html
import re
import zlib
from html.parser import HTMLParser

#: tags whose entire subtree is dropped (never content)
_DROP_TAGS = {"script", "style", "head", "noscript", "template", "svg"}
#: structural boilerplate tags (dropped regardless of content)
_BOILER_TAGS = {"nav", "header", "footer", "aside"}
#: class/id keywords that mark a subtree as boilerplate
_BOILER_RX = re.compile(
    r"(?:^|[-_ ])(?:nav|menu|header|footer|sidebar|side-bar|ad|ads|advert|"
    r"banner|promo|cookie|popup|share|social|comment)(?:$|[-_ ])",
    re.IGNORECASE,
)
#: block-level elements — candidate containers and paragraph boundaries
_BLOCK_TAGS = {
    "html", "body", "main", "article", "section", "div", "p", "li", "ul",
    "ol", "td", "th", "tr", "table", "blockquote", "pre",
    "h1", "h2", "h3", "h4", "h5", "h6",
}
#: void elements the parser will not see an end tag for
_VOID_TAGS = {"br", "hr", "img", "meta", "link", "input", "area", "base",
              "col", "embed", "source", "track", "wbr"}


class _Node:
    __slots__ = ("tag", "children", "parts", "text_len", "link_len")

    def __init__(self, tag: str):
        self.tag = tag
        self.children: list[_Node] = []
        self.parts: list[str] = []  # direct text runs (entity-decoded)
        self.text_len = 0
        self.link_len = 0


class _Dom(HTMLParser):
    """Builds the pruned block tree; inline tags pass text through to the
    nearest block ancestor, dropped/boiler subtrees are skipped whole."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("html")
        self.stack = [self.root]
        self.drop_depth = 0
        self.drop_tag = None
        self.a_depth = 0

    def handle_starttag(self, tag, attrs):
        if self.drop_depth:
            # count only SAME-TAG nesting: real crawl HTML leaves <li>/<p>/
            # <td> unclosed inside nav/header blocks, and counting every
            # start tag would leave drop_depth > 0 after the boilerplate
            # element closes — silently discarding the rest of the page
            if tag == self.drop_tag:
                self.drop_depth += 1
            return
        marks = " ".join(v or "" for k, v in attrs if k in ("class", "id"))
        if tag in _DROP_TAGS or tag in _BOILER_TAGS or _BOILER_RX.search(marks):
            if tag in _VOID_TAGS:
                return
            self.drop_depth = 1
            self.drop_tag = tag
            return
        if tag == "a":
            self.a_depth += 1
            return
        if tag in _BLOCK_TAGS:
            node = _Node(tag)
            self.stack[-1].children.append(node)
            self.stack.append(node)
        # inline tags: transparent

    def handle_endtag(self, tag):
        if self.drop_depth:
            if tag == self.drop_tag:
                self.drop_depth -= 1
                if self.drop_depth == 0:
                    self.drop_tag = None
            return
        if tag == "a":
            self.a_depth = max(0, self.a_depth - 1)
            return
        if tag in _BLOCK_TAGS and len(self.stack) > 1:
            # close the nearest open block of this tag (tolerates nesting
            # sloppiness in real crawl HTML)
            for i in range(len(self.stack) - 1, 0, -1):
                if self.stack[i].tag == tag:
                    del self.stack[i:]
                    break

    def handle_data(self, data):
        if self.drop_depth or not data:
            return
        node = self.stack[-1]
        node.parts.append(data)
        node.text_len += len(data)
        if self.a_depth:
            node.link_len += len(data)


def _finalize(node: _Node) -> tuple[str, int, int]:
    """Bottom-up: (joined_text, text_len, link_len) per node; block children
    contribute as paragraphs (blank-line separated)."""
    paras = []
    own = "".join(node.parts)
    tl, ll = node.text_len, node.link_len
    if own.strip() or node.parts and not node.children:
        paras.append(own)
    for ch in node.children:
        t, ctl, cll = _finalize(ch)
        tl += ctl
        ll += cll
        if t or ch.parts:
            paras.append(t)
    text = "\n\n".join(paras)
    node.parts = [text]  # memoize joined form
    node.text_len, node.link_len = tl, ll
    return text, tl, ll


def _best(node: _Node, out: list) -> None:
    stripped = len(node.parts[0].strip()) if node.parts else 0
    if node.text_len:
        density = node.link_len / node.text_len
        score = stripped * (1.0 - density) ** 2
    else:
        score = 0.0
    out.append((score, node))
    for ch in node.children:
        _best(ch, out)


def extract_main(page_html: str) -> str:
    """Main content of an HTML page: best-scoring block's text, paragraphs
    joined with a blank line; "" when nothing survives the boilerplate
    strip. Pure function of the input string — safe in any batch UDF."""
    dom = _Dom()
    dom.feed(page_html or "")
    dom.close()
    _finalize(dom.root)
    scored: list = []
    _best(dom.root, scored)
    if not scored:
        return ""
    top = max(s for s, _ in scored)
    if top <= 0:
        # no scoring text anywhere: deepest container (most specific) wins
        return scored[-1][1].parts[0] if scored[-1][1].parts else ""
    # smallest node within 5% of the best score = tightest main container
    cands = [n for s, n in scored if s >= 0.95 * top]
    node = min(cands, key=lambda n: n.text_len)
    return node.parts[0]


# ---------------------------------------------------------------------------
# deterministic synthetic crawl page (the corpus side)
# ---------------------------------------------------------------------------

_NAV_WORDS = ("home", "products", "pricing", "blog", "careers", "about",
              "contact", "support", "docs", "login")


def wrap_page(doc_id, text: str) -> str:
    """Wrap source text in a deterministic synthetic crawl page: header
    nav links, link-heavy unmarked nav div, ad sidebar, cookie banner,
    footer — everything a main-content extractor must strip. Boilerplate
    content varies per doc (seeded CRC) so extractors can't cheat on a
    fixed template. ``extract_main(wrap_page(i, t)) == t`` exactly."""
    h = zlib.crc32(str(doc_id).encode())
    nav = "".join(
        f'<a href="/{w}">{w.title()}</a> '
        for w in _NAV_WORDS[: 4 + h % 5]
    )
    paras = "".join(
        f"<p>{_html.escape(p, quote=False)}</p>"
        for p in (text or "").split("\n\n")
    )
    return (
        "<html><head><title>doc {}</title><style>body{{margin:0}}</style>"
        "<script>var t={};</script></head><body>"
        '<header class="site-header"><h1>Site {}</h1>{}</header>'
        "<nav>{}</nav>"
        '<div id="main-wrap">'
        '<div class="sidebar">Sponsored: offer {} <a href="/buy">Buy now'
        "</a></div>"
        "<main><article>{}</article></main>"
        "</div>"
        '<div class="cookie-notice">We use cookies. <a href="/ok">OK</a>'
        "</div>"
        "<footer>© {} Example Corp · <a href=\"/terms\">Terms</a></footer>"
        "</body></html>"
    ).format(doc_id, h % 97, h % 13, nav, nav, h % 1000, paras, 2000 + h % 26)
