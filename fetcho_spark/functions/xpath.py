"""``xpath:`` filter support — a small XPath subset over ``html.parser``
(SURVEY.md §2.3 F18; reference common/Query/Filters/XPathFilter.cs:8-82).

The reference loads the page into HtmlAgilityPack and runs
``SelectNodes(xpath)``; a match is "≥1 node selected" (the filter is
include-only — it returns an empty tag). lxml is not in this container, so
this module implements the documented subset over the stdlib HTML parser:

    path  := ('/' | '//') step (('/' | '//') step)*
    step  := name | '*' | text() | @attr
    preds := [@attr] | [@attr='v'] | [n]     (n is 1-based position)

``//`` = descendant-or-self, ``/`` = child. Element steps yield the node's
recursive text; ``text()`` yields immediate text; ``@attr`` yields the
attribute value. Evaluation is a pure function wrapped in an Arrow-batched
pandas UDF — one Python crossing per batch, applied only to rows that
survived the cheaper filters (cost 1000 orders it last, R1/R3).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_VOID_TAGS = {"br", "img", "meta", "link", "input", "hr", "base", "area",
              "col", "embed", "source", "track", "wbr"}

# HTML5 implicit end tags: starting <X> closes a still-open <Y> for these
# (the OptionFixNestedTags behavior the reference relies on)
_IMPLICIT_CLOSE = {
    "li": {"li"}, "p": {"p"}, "tr": {"tr", "td", "th"},
    "td": {"td", "th"}, "th": {"td", "th"}, "option": {"option"},
    "dt": {"dt", "dd"}, "dd": {"dt", "dd"},
}


class _Node:
    __slots__ = ("tag", "attrs", "content", "parent")

    def __init__(self, tag, attrs=None, parent=None):
        self.tag = tag
        self.attrs = dict(attrs or {})
        self.content: list = []   # document-ordered: str | _Node
        self.parent = parent

    @property
    def children(self):
        return [c for c in self.content if isinstance(c, _Node)]

    @property
    def texts(self):
        return [c for c in self.content if isinstance(c, str)]

    def itertext(self):
        for c in self.content:
            if isinstance(c, str):
                yield c
            else:
                yield from c.itertext()

    def text(self) -> str:
        return re.sub(r"\s+", " ", "".join(self.itertext())).strip()

    def descendants(self):
        for c in self.children:
            yield c
            yield from c.descendants()


class _DomBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#document")
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        closes = _IMPLICIT_CLOSE.get(tag, ())
        while self.cur is not self.root and self.cur.tag in closes:
            self.cur = self.cur.parent
        node = _Node(tag, attrs, self.cur)
        self.cur.content.append(node)
        if tag not in _VOID_TAGS:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.content.append(_Node(tag, attrs, self.cur))

    def handle_endtag(self, tag):
        # close the nearest open ancestor with this tag (tolerates the
        # unclosed-<li>-style HTML the reference's OptionFixNestedTags eats)
        n = self.cur
        while n is not self.root and n.tag != tag:
            n = n.parent
        if n is not self.root:
            self.cur = n.parent

    def handle_data(self, data):
        if data:
            self.cur.content.append(data)


def parse_html(src: str) -> _Node:
    b = _DomBuilder()
    b.feed(src or "")
    return b.root


_STEP_RE = re.compile(
    r"^(?P<name>[A-Za-z][A-Za-z0-9_-]*|\*|text\(\)|@[A-Za-z][A-Za-z0-9_-]*)"
    r"(?P<preds>(?:\[[^\]]*\])*)$")
_PRED_RE = re.compile(r"\[([^\]]*)\]")
_ATTR_EQ_RE = re.compile(r"^@([A-Za-z][A-Za-z0-9_-]*)\s*=\s*'([^']*)'$")
_ATTR_RE = re.compile(r"^@([A-Za-z][A-Za-z0-9_-]*)$")


def _split_path(xpath: str) -> list[tuple[bool, str]]:
    """→ [(descendant?, step_text), …]; leading '//' vs '/' sets the first
    axis. Raises ValueError on anything outside the subset."""
    s = xpath.strip()
    if not s.startswith("/"):
        s = "//" + s  # bare 'div' ≡ '//div' (HtmlAgilityPack tolerance)
    out = []
    i = 0
    while i < len(s):
        if s.startswith("//", i):
            deep, i = True, i + 2
        elif s.startswith("/", i):
            deep, i = False, i + 1
        else:
            raise ValueError(f"bad xpath near {s[i:]!r}")
        j = s.find("/", i)
        # don't split inside a predicate bracket
        while j != -1 and s.count("[", i, j) != s.count("]", i, j):
            j = s.find("/", j + 1)
        step = s[i:] if j == -1 else s[i:j]
        if not step:
            raise ValueError(f"empty step in {xpath!r}")
        out.append((deep, step))
        i = len(s) if j == -1 else j
    return out


def _apply_step(nodes: list[_Node], deep: bool, step: str):
    m = _STEP_RE.match(step)
    if not m:
        raise ValueError(f"unsupported xpath step {step!r}")
    name, preds = m.group("name"), _PRED_RE.findall(m.group("preds"))
    if name == "text()" or name.startswith("@"):
        if preds:
            raise ValueError(f"predicates not allowed on {name!r}")
        vals = []
        for n in nodes:
            if name == "text()":
                t = re.sub(r"\s+", " ", "".join(n.texts)).strip()
                if t:
                    vals.append(t)
            else:
                v = n.attrs.get(name[1:])
                if v is not None:
                    vals.append(v)
        return vals  # terminal: list[str]
    cand = []
    for n in nodes:
        pool = n.descendants() if deep else n.children
        for c in pool:
            if name == "*" or c.tag == name:
                cand.append(c)
    # positional predicates apply per parent group in real XPath; the
    # subset applies them over the step's candidate list per source node —
    # adequate for the documented use (single-element selection)
    for p in preds:
        p = p.strip()
        if p.isdigit():
            k = int(p)
            cand = [cand[k - 1]] if 1 <= k <= len(cand) else []
            continue
        m_eq = _ATTR_EQ_RE.match(p)
        if m_eq:
            cand = [c for c in cand
                    if c.attrs.get(m_eq.group(1)) == m_eq.group(2)]
            continue
        m_has = _ATTR_RE.match(p)
        if m_has:
            cand = [c for c in cand if m_has.group(1) in c.attrs]
            continue
        raise ValueError(f"unsupported predicate [{p}]")
    return cand


def xpath_select(html_src: str | None, xpath: str) -> list[str]:
    """Evaluate the subset xpath; returns matched strings (node text /
    text() / @attr values). Empty list = no match. Invalid xpath raises at
    compile time (query parse), bad HTML never raises (best-effort DOM)."""
    steps = _split_path(xpath)  # validates even for None input
    if not html_src:
        return []
    nodes: list = [parse_html(html_src)]
    for deep, step in steps:
        if not isinstance(nodes, list) or (nodes and isinstance(nodes[0], str)):
            raise ValueError(f"step after terminal in {xpath!r}")
        nodes = _apply_step(nodes, deep, step)
        if not nodes:
            return []
    if nodes and isinstance(nodes[0], _Node):
        return [n.text() for n in nodes]
    return list(nodes)


def make_xpath_udf(xpath: str):
    """Arrow-batched UDF html → array<string> of matches for a fixed,
    pre-validated xpath (compiled once per query, broadcast by closure)."""
    _split_path(xpath)  # raise at query-compile time on bad xpath

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _udf(html_col: pd.Series) -> pd.Series:
        return pd.Series([xpath_select(h, xpath) for h in html_col],
                         dtype=object)

    return _udf


def xpath_col(html_col: Column, xpath: str) -> Column:
    return make_xpath_udf(xpath)(html_col)
