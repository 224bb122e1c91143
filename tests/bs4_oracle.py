"""Independent mini-DOM oracle for the reference HTML extraction.

Re-creates what ``BeautifulSoup(html, 'html.parser')`` (bs4 >= 4.9)
does for the reference extraction pipeline (crawler.py:333-361), but as
an ACTUAL tree — parse to nodes, decompose removed subtrees, find
title/meta/body, get_text over descendants — i.e. structurally nothing
like the engine's single-pass event-stream extractor
(search_engine_spark/text/extract.py).  The two are compared over an
adversarial fixture battery and property fuzzing in
tests/test_extract_differential.py; agreement pins the extractor to
bs4 tree semantics rather than to itself.

bs4 behaviors modeled (all public, from the bs4 docs / HTML spec):
  * the html.parser backend tokenizes with the SAME stdlib HTMLParser
    (convert_charrefs=True) the engine uses — divergence can only come
    from tree building, which is what this oracle exercises;
  * an end tag pops the open-element stack to and including the nearest
    open element of that name (``_popToTag``); unmatched end tags are
    ignored; documents may leave elements open at EOF;
  * void elements never take children; ``<x/>`` acts as open+close;
  * comments / declarations / CDATA / processing instructions are
    non-string nodes: excluded from get_text (bs4 >= 4.9 default);
  * ``get_text(separator, strip=True)`` strips each string descendant
    and joins the non-empty ones with the separator.

Known not modeled (kept out of the fixture battery, documented in
scripts/gen_extract_goldens.py): duplicate attributes on one tag
(bs4's on_duplicate_attribute policy), non-HTML void extras
(basefont/bgsound/...), bs4's whitespace-preserving <pre> handling
(irrelevant: the reference collapses all whitespace afterwards).

To upgrade the committed goldens from oracle-derived to
reference-identical, run scripts/gen_extract_goldens.py in an
environment with real bs4 installed; it prefers bs4 and records the
provenance in the golden file.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

REMOVED = ("script", "style", "nav", "footer", "header", "aside")
VOID = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input",
     "link", "meta", "param", "source", "track", "wbr"}
)


class Node:
    def __init__(self, name, attrs=None, parent=None):
        self.name = name  # None for the document root
        self.attrs = dict(attrs or [])
        self.parent = parent
        self.children: list = []  # Node | Text

    def iter_tags(self):
        """Pre-order (document order) tag traversal, self excluded."""
        for c in self.children:
            if isinstance(c, Node):
                yield c
                yield from c.iter_tags()

    def find(self, name, attr_match=None):
        for t in self.iter_tags():
            if t.name == name and (
                attr_match is None
                or all(t.attrs.get(k) == v for k, v in attr_match.items())
            ):
                return t
        return None

    def strings(self):
        for c in self.children:
            if isinstance(c, Text):
                yield c.value
            else:
                yield from c.strings()

    def get_text(self, separator="", strip=False):
        if strip:
            return separator.join(
                s for s in (x.strip() for x in self.strings()) if s
            )
        return separator.join(self.strings())

    def decompose(self):
        if self.parent is not None:
            self.parent.children.remove(self)
            self.parent = None


class Text:
    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value


class _TreeParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node(None)
        self.open: list[Node] = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, attrs, parent=self.open[-1])
        self.open[-1].children.append(node)
        if tag not in VOID:
            self.open.append(node)

    def handle_endtag(self, tag):
        if tag in VOID:
            return
        for i in range(len(self.open) - 1, 0, -1):  # never pop the root
            if self.open[i].name == tag:
                del self.open[i:]
                return

    def handle_data(self, data):
        self.open[-1].children.append(Text(data))

    # Comment/Declaration/PI/CDATA: non-string nodes, invisible to
    # get_text -> simply not added to the tree.
    def handle_comment(self, data):
        pass

    def handle_decl(self, decl):
        pass

    def handle_pi(self, data):
        pass

    def unknown_decl(self, data):
        pass


def parse(html: str) -> Node:
    p = _TreeParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return p.root


def oracle_extract(html: str):
    """The reference pipeline (crawler.py:333-361) over the mini-DOM."""
    soup = parse(html)

    for name in REMOVED:
        # find_all+decompose: materialize first (decomposing a parent
        # detaches nested matches, whose decompose is then a no-op)
        for t in list(t for t in soup.iter_tags() if t.name == name):
            t.decompose()

    title_tag = soup.find("title")
    title = title_tag.get_text(strip=True) if title_tag else ""

    description = ""
    meta = None
    for t in soup.iter_tags():
        if t.name == "meta" and t.attrs.get("name") == "description":
            meta = t
            break
    if meta is not None and meta.attrs.get("content"):
        description = meta.attrs["content"].strip()

    body = soup.find("body")
    scope = body if body is not None else soup
    text = re.sub(r"\s+", " ", scope.get_text(separator=" ", strip=True))
    return title, description, text[:50_000]
