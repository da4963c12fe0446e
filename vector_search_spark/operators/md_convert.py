"""Pure-stdlib HTML → Markdown converter, faithful to the reference pipeline.

The reference converts newsletter HTML with BeautifulSoup + markdownify
1.2.2 (`pipeline/markdown_assets.py:66-91`):
``md(str(soup.find("div", {"class": "page__content"})), heading_style="ATX")``
prefixed with ``f"# {title}\\n\\n"`` where title is
``soup.select_one(".page__header h1").get_text(strip=True)``.

Neither library is installed in this container, so this module re-implements
the subset of their behavior the newsletter corpus exercises using only the
standard library (``html.parser``), and is golden-verified byte-identical
against all 331 reference markdown files (``tests/test_html_md_golden.py``).
It is an independent implementation of the PUBLISHED markdownify semantics
(whitespace canonicalization, chomp'd inline marks, ATX headings, bullet
indent rules), not a copy of its code.

Scale note: conversion is per-row Python and runs inside the Arrow-batched
pandas UDF seam in ``operators/html.py`` — the sanctioned slow path for
logic Spark expressions cannot express (SURVEY.md §2.6).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

__all__ = ["html_page_to_markdown", "html_to_markdown", "parse_html"]


# ---------------------------------------------------------------------------
# Minimal DOM (mirrors the bs4 html.parser tree-building behavior we rely on)
# ---------------------------------------------------------------------------

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class Node:
    """Element node: ``name``, ``attrs`` dict, mixed children (Node | str)."""

    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs=None, parent: "Node | None" = None):
        self.name = name
        self.attrs = dict(attrs or [])
        self.children: list[Node | str] = []
        self.parent = parent

    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    def get(self, key: str):
        return self.attrs.get(key)

    def get_text(self, strip: bool = False) -> str:
        """bs4 ``get_text()``: concatenated descendant strings; with
        ``strip=True`` each string is stripped and empties are skipped."""
        parts: list[str] = []

        def walk(n: Node) -> None:
            for c in n.children:
                if isinstance(c, str):
                    if strip:
                        c = c.strip()
                        if not c:
                            continue
                    parts.append(c)
                else:
                    walk(c)

        walk(self)
        return "".join(parts)

    def find_class(self, name: str, class_token: str) -> "Node | None":
        """First descendant element named ``name`` carrying the class token."""
        for c in self.children:
            if isinstance(c, Node):
                if (name == "*" or c.name == name) and class_token in c.classes():
                    return c
                hit = c.find_class(name, class_token)
                if hit is not None:
                    return hit
        return None

    def find_tag(self, name: str) -> "Node | None":
        for c in self.children:
            if isinstance(c, Node):
                if c.name == name:
                    return c
                hit = c.find_tag(name)
                if hit is not None:
                    return hit
        return None


class _TreeBuilder(HTMLParser):
    """bs4-compatible-enough tree builder: void elements never take
    children; a mismatched end tag pops down to its nearest open ancestor
    (bs4 ``_popToTag``) or is ignored; adjacent text chunks merge;
    entities are decoded in text (``convert_charrefs=True``, as bs4)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]

    def _append_node(self, tag: str, attrs) -> Node:
        n = Node(tag, attrs, self.stack[-1])
        self.stack[-1].children.append(n)
        return n

    def handle_starttag(self, tag, attrs):
        n = self._append_node(tag, attrs)
        if tag not in _VOID:
            self.stack.append(n)

    def handle_startendtag(self, tag, attrs):
        self._append_node(tag, attrs)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return
        # no matching open tag: ignore (bs4 behavior)

    def handle_data(self, data):
        kids = self.stack[-1].children
        if kids and isinstance(kids[-1], str):
            kids[-1] += data
        else:
            kids.append(data)


def parse_html(html: str) -> Node:
    tb = _TreeBuilder()
    tb.feed(html)
    tb.close()
    return tb.root


# ---------------------------------------------------------------------------
# Markdown conversion (markdownify 1.2.2 semantics, ATX headings, defaults)
# ---------------------------------------------------------------------------

_WHITESPACE_RE = re.compile(r"[\t \r\n]+")
_ALL_WHITESPACE_RE = re.compile(r"[\t \r\n]+")
_LINE_WITH_CONTENT_RE = re.compile(r"^(.*)", flags=re.MULTILINE)
_HEADING_RE = re.compile(r"h([1-6])$")
_NL_SPLIT_RE = re.compile(r"(\n*)((?:.*[^\n])?)(\n*)$", flags=re.DOTALL)
_ASCII_WS = " \t\n\r"

# Block-level elements: whitespace-only text directly inside them, or
# adjacent to them, is dropped before conversion.
_BLOCK_INSIDE = {
    "p", "blockquote", "article", "div", "section",
    "ol", "ul", "li", "dl", "dt", "dd",
    "table", "thead", "tbody", "tfoot", "tr", "td", "th",
}


def _remove_ws_inside(el) -> bool:
    if not isinstance(el, Node):
        return False
    return bool(_HEADING_RE.match(el.name)) or el.name in _BLOCK_INSIDE


def _remove_ws_outside(el) -> bool:
    return _remove_ws_inside(el) or (isinstance(el, Node) and el.name == "pre")


def _chomp(text: str) -> tuple[str, str, str]:
    """Move an inline element's leading/trailing single space outside its
    markup (markdownify ``chomp``)."""
    prefix = " " if text and text[0] == " " else ""
    suffix = " " if text and text[-1] == " " else ""
    return prefix, suffix, text.strip()


def _is_block_content(el) -> bool:
    if isinstance(el, Node):
        return True
    return isinstance(el, str) and el.strip() != ""


class _Converter:
    """The subset of markdownify 1.2.2 the newsletter corpus exercises,
    with defaults: ATX headings, ``*`` emphasis, two-space line breaks,
    ``*``/``_`` escaped in text, autolinks on, document newline-stripped."""

    def __init__(self, heading_style: str = "atx"):
        self.heading_style = heading_style

    # -- text nodes ---------------------------------------------------------

    def process_text(self, text: str, parent_tags: set[str]) -> str:
        if "_noformat" not in parent_tags:
            text = _WHITESPACE_RE.sub(" ", text)
            text = text.replace("*", r"\*").replace("_", r"\_")
        return text

    # -- element dispatch ---------------------------------------------------

    def process_tag(self, node: Node, parent_tags: set[str]) -> str:
        children = list(node.children)

        # drop whitespace-only text adjacent to block-level siblings or at
        # the edges of a block-level parent
        inside = _remove_ws_inside(node)
        kept = []
        for i, el in enumerate(children):
            if isinstance(el, str) and el.strip() == "":
                prev_el = children[i - 1] if i > 0 else None
                next_el = children[i + 1] if i + 1 < len(children) else None
                if inside and (prev_el is None or next_el is None):
                    continue
                if _remove_ws_outside(prev_el) or _remove_ws_outside(next_el):
                    continue
            kept.append(el)

        child_tags = set(parent_tags)
        child_tags.add(node.name)
        if _HEADING_RE.match(node.name) or node.name in ("td", "th"):
            child_tags.add("_inline")
        if node.name in ("pre", "code", "kbd", "samp"):
            child_tags.add("_noformat")

        child_strings = []
        for i, el in enumerate(kept):
            if isinstance(el, str):
                s = self.process_text(el, child_tags)
                # Unicode-strip text-node edges that touch a block boundary.
                # This is edge-POSITION-sensitive, not just edge-CONTENT:
                # "14:\xa0</p>" loses the NBSP (text node ends the block) but
                # "mind:\xa0</span></p>" keeps it (the text node's own parent
                # is inline) — both verified against the reference corpus
                # (goldens 2020-12-10.md vs 2020-04-09.md).
                prev_el = kept[i - 1] if i > 0 else None
                next_el = kept[i + 1] if i + 1 < len(kept) else None
                if _remove_ws_outside(prev_el) or (inside and prev_el is None):
                    s = s.lstrip()
                if _remove_ws_outside(next_el) or (inside and next_el is None):
                    s = s.rstrip()
            else:
                s = self.process_tag(el, child_tags)
            if s:
                child_strings.append(s)

        # collapse newlines at child boundaries (max 2), outside <pre>
        if node.name != "pre" and "pre" not in parent_tags:
            merged = [""]
            for s in child_strings:
                leading, content, trailing = _NL_SPLIT_RE.match(s).groups()
                if merged[-1] and leading:
                    prev = merged.pop()
                    leading = "\n" * min(2, max(len(prev), len(leading)))
                merged += [leading, content, trailing]
            child_strings = merged
        text = "".join(child_strings)

        convert = getattr(self, "convert_" + node.name.strip("[]"), None)
        if convert is not None:
            text = convert(node, text, parent_tags)
        return text

    # -- block conversions --------------------------------------------------

    def convert_document(self, el, text, parent_tags):
        return text.strip("\n")

    # NOTE: block-edge strips are ASCII-whitespace-only ("\t\n\r "), never
    # str.strip(): the reference corpus preserves U+00A0 at paragraph edges
    # (golden 2020-04-09.md "open mind:\xa0"), and Python's bare strip()
    # would eat it.

    def convert_p(self, el, text, parent_tags):
        if "_inline" in parent_tags:
            return " " + text.strip(_ASCII_WS) + " "
        text = text.strip(_ASCII_WS)
        return "\n\n%s\n\n" % text if text else ""

    def convert_div(self, el, text, parent_tags):
        if "_inline" in parent_tags:
            return " " + text.strip(_ASCII_WS) + " "
        text = text.strip(_ASCII_WS)
        return "\n\n%s\n\n" % text if text else ""

    convert_article = convert_div
    convert_section = convert_div
    # figures are block containers: their content (typically an image) gets
    # paragraph-style separation (golden 2024-01-04.md: blank line between
    # the figure's image and the following heading)
    convert_figure = convert_div

    def convert_hn(self, n, el, text, parent_tags):
        if "_inline" in parent_tags:
            return text
        text = text.strip(_ASCII_WS)
        text = _ALL_WHITESPACE_RE.sub(" ", text)
        hashes = "#" * n
        return "\n%s %s\n\n" % (hashes, text)

    def convert_h1(self, el, text, parent_tags):
        return self.convert_hn(1, el, text, parent_tags)

    def convert_h2(self, el, text, parent_tags):
        return self.convert_hn(2, el, text, parent_tags)

    def convert_h3(self, el, text, parent_tags):
        return self.convert_hn(3, el, text, parent_tags)

    def convert_h4(self, el, text, parent_tags):
        return self.convert_hn(4, el, text, parent_tags)

    def convert_h5(self, el, text, parent_tags):
        return self.convert_hn(5, el, text, parent_tags)

    def convert_h6(self, el, text, parent_tags):
        return self.convert_hn(6, el, text, parent_tags)

    def convert_hr(self, el, text, parent_tags):
        return "\n\n---\n\n"

    def convert_br(self, el, text, parent_tags):
        if "_inline" in parent_tags:
            return " "
        return "  \n"

    def convert_blockquote(self, el, text, parent_tags):
        text = (text or "").strip(" \t")
        if "_inline" in parent_tags:
            return " " + text.strip(_ASCII_WS) + " "
        if not text:
            return "\n"

        def indent(match):
            line = match.group(1)
            return "> " + line if line else ">"

        return "\n" + _LINE_WITH_CONTENT_RE.sub(indent, text.strip(_ASCII_WS)) + "\n\n"

    def convert_list(self, el, text, parent_tags):
        before_paragraph = False
        nxt = self._next_block_sibling(el)
        if nxt is not None and (not isinstance(nxt, Node) or nxt.name not in ("ul", "ol")):
            before_paragraph = True
        if "li" in parent_tags:
            return "\n" + text.rstrip()
        return "\n\n" + text + ("\n" if before_paragraph else "")

    convert_ul = convert_list
    convert_ol = convert_list

    @staticmethod
    def _next_block_sibling(el: Node):
        sibs = el.parent.children if el.parent is not None else []
        try:
            idx = sibs.index(el)
        except ValueError:
            return None
        for s in sibs[idx + 1:]:
            if _is_block_content(s):
                return s
        return None

    def convert_li(self, el, text, parent_tags):
        text = (text or "").strip(_ASCII_WS)
        if not text:
            return "\n"
        parent = el.parent
        if parent is not None and parent.name == "ol":
            start_attr = parent.get("start")
            start = int(start_attr) if start_attr and str(start_attr).isnumeric() else 1
            prior = sum(
                1
                for s in parent.children[: parent.children.index(el)]
                if isinstance(s, Node) and s.name == "li"
            )
            bullet = "%s." % (start + prior)
        else:
            depth = -1
            p = el
            while p is not None:
                if isinstance(p, Node) and p.name == "ul":
                    depth += 1
                p = p.parent
            bullet = "*+-"[depth % 3]
        bullet = bullet + " "
        indent = " " * len(bullet)

        def indent_line(match):
            line = match.group(1)
            return indent + line if line else ""

        text = _LINE_WITH_CONTENT_RE.sub(indent_line, text)
        return "%s\n" % (bullet + text[len(bullet):])

    # -- inline conversions -------------------------------------------------

    def _inline(self, markup, text, parent_tags):
        if "_noformat" in parent_tags:
            return text
        prefix, suffix, text = _chomp(text)
        if not text:
            return ""
        return "%s%s%s%s%s" % (prefix, markup, text, markup, suffix)

    def convert_em(self, el, text, parent_tags):
        return self._inline("*", text, parent_tags)

    convert_i = convert_em

    def convert_strong(self, el, text, parent_tags):
        return self._inline("**", text, parent_tags)

    convert_b = convert_strong

    def convert_s(self, el, text, parent_tags):
        return self._inline("~~", text, parent_tags)

    convert_del = convert_s

    def convert_a(self, el, text, parent_tags):
        if "_noformat" in parent_tags:
            return text
        prefix, suffix, text = _chomp(text)
        if not text:
            return ""
        href = el.get("href")
        title = el.get("title")
        # autolink shortcut (text == href, modulo escaped underscores)
        if text.replace(r"\_", "_") == href and not title:
            return "<%s>" % href
        title_part = ' "%s"' % title.replace('"', r"\"") if title else ""
        return (
            "%s[%s](%s%s)%s" % (prefix, text, href, title_part, suffix)
            if href
            else text
        )

    def convert_img(self, el, text, parent_tags):
        alt = el.get("alt") or ""
        src = el.get("src") or ""
        title = el.get("title") or ""
        title_part = ' "%s"' % title.replace('"', r"\"") if title else ""
        if "_inline" in parent_tags:
            return alt
        return "![%s](%s%s)" % (alt, src, title_part)


def html_to_markdown(html: str, heading_style: str = "atx") -> str:
    """markdownify-equivalent conversion of an HTML fragment."""
    root = parse_html(html)
    return _Converter(heading_style).process_tag(root, set())


def html_page_to_markdown(html: str) -> tuple[str | None, str | None]:
    """Full reference page conversion (`pipeline/markdown_assets.py:66-91`):
    returns ``(title, "# {title}\\n\\n{body_md}")`` or ``(None, None)`` when
    the page has no ``div.page__content``."""
    root = parse_html(html)
    content = root.find_class("div", "page__content")
    if content is None:
        return None, None
    header = root.find_class("*", "page__header")
    h1 = header.find_tag("h1") if header is not None else None
    title = h1.get_text(strip=True) if h1 is not None else "Unknown"
    body = _Converter("atx").process_tag(content, set())
    # the reference feeds str(div) to markdownify, whose [document] root
    # strips leading/trailing newlines around the converted div
    return title, "# %s\n\n%s" % (title, body.strip("\n"))
