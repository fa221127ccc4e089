"""Minimal DOM + goquery-compatible traversal built on the Python stdlib.

The reference crawler (Alvazz/gocrawler) extracts data with goquery
(``github.com/PuerkitoBio/goquery``) selections over pages fetched by
colly. This container has no lxml/bs4/selectolax, so we implement the
small DOM + selector subset the reference actually uses, with semantics
pinned to goquery where they are observable:

* ``Sel.text()`` — concatenation of **all text nodes in document order**
  with no normalization whatsoever (goquery ``Selection.Text()``).
* CSS subset: tag, ``#id``, ``.class``, ``[attr="v"]``, ``[attr*="v"]``,
  descendant, child ``>``, general sibling ``~``, and comma groups.
  This covers every selector in the reference
  (`/root/reference/pkg/scraper/mixup.go:70-210`,
  `/root/reference/pkg/scraper/amazon.go:100-291`).
* Traversals used by the reference: Find, Filter, FilterFunction,
  ChildrenFiltered, Contents, Next, NextAllFiltered, Parent, HasClass,
  Attr, Each.

This module is deliberately dependency-free so the same code runs inside
pandas UDF workers on executors and in the single-threaded golden
simulator (tests compare the two byte-for-byte).
"""

from __future__ import annotations

import re
from bisect import bisect_right
from html.parser import HTMLParser
from operator import attrgetter

_NODE_ORDER = attrgetter("order")
_NODE_DATA = attrgetter("data")

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# shared read-only empty attrs dict (see Node.__init__) and the
# class-string → split-tuple cache (see Node.classes)
_EMPTY_ATTRS: dict = {}
_CLASSES_CACHE: dict = {}
_NO_CHILDREN: tuple = ()


class Node:
    """One DOM node: element or text.

    ``order`` is the node's position in document order (assigned during
    parsing); ``end`` is the highest ``order`` inside its subtree, so
    "m is a descendant of n" is exactly ``n.order < m.order <= n.end``.
    Parsed roots additionally carry ``tag_index`` (tag → nodes in
    document order) so selections scan candidates of the right tag via
    a binary-searched order interval instead of walking the subtree —
    the walk was the extraction kernel's hottest loop, and the saving
    grows with page size (real crawled pages are 10-100x the fixtures).
    ``text_index`` (all text nodes, document order) plays the same role
    for :meth:`text`: a subtree's text is the bisected order interval
    joined, no walk; text nodes are leaves, so the interval is exact.
    ``class_index`` / ``id_index`` (class → nodes, id → nodes, document
    order) let class- and id-bearing compounds — the majority of the
    reference's selectors — start from a few candidates instead of every
    node of a tag.
    """

    __slots__ = (
        "tag", "attrs", "children", "parent", "is_text", "data", "order",
        "end", "tag_index", "text_index", "class_index", "id_index",
    )

    def __init__(self, tag="", attrs=None, parent=None, is_text=False, data="", order=0):
        self.tag = tag
        # attr-less elements and text nodes share ONE empty dict: consumers
        # treat attrs as read-only (same contract the _ATTRS_CACHE sharing
        # already relies on), and the per-node dict alloc was measurable
        self.attrs = _EMPTY_ATTRS if attrs is None else attrs
        # text nodes are always leaves: share one immutable empty tuple
        # instead of allocating a list per node (walks only iterate)
        self.children = _NO_CHILDREN if is_text else []
        self.parent = parent
        self.is_text = is_text
        self.data = data
        self.order = order
        self.end = order

    # -- helpers ---------------------------------------------------------
    def classes(self):
        # templated pages repeat the same class strings on thousands of
        # nodes; cache the split per distinct string (callers don't mutate)
        cls = self.attrs.get("class", "")
        if not cls:
            return ()
        lst = _CLASSES_CACHE.get(cls)
        if lst is None:
            if len(_CLASSES_CACHE) >= 4096:
                _CLASSES_CACHE.clear()
            lst = _CLASSES_CACHE[cls] = tuple(cls.split())
        return lst

    def iter_subtree(self):
        """Yield descendants (not self) in document order."""
        stack = list(reversed(self.children))
        while stack:
            n = stack.pop()
            yield n
            stack.extend(reversed(n.children))

    def text(self):
        """goquery ``.Text()``: all text-node data, document order, raw."""
        if self.is_text:
            return self.data  # text nodes have no children
        root = self
        p = root.parent
        while p is not None:
            root = p
            p = root.parent
        try:
            tindex = root.text_index
        except AttributeError:
            tindex = None  # manually assembled tree: walk below
        if tindex is not None:
            if root is self:
                return "".join(map(_NODE_DATA, tindex))
            lo = bisect_right(tindex, self.order, key=_NODE_ORDER)
            hi = bisect_right(tindex, self.end, key=_NODE_ORDER)
            return "".join(map(_NODE_DATA, tindex[lo:hi]))
        parts = []
        stack = list(reversed(self.children))
        while stack:  # inlined iter_subtree: no generator frames
            n = stack.pop()
            if n.is_text:
                parts.append(n.data)
            elif n.children:
                stack.extend(reversed(n.children))
        return "".join(parts)

    def __repr__(self):  # pragma: no cover - debugging aid
        if self.is_text:
            return f"Text({self.data!r})"
        return f"<{self.tag} {self.attrs}>"


class _DomBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node(tag="#document")
        self._stack = [self.root]
        self._order = 0

    def _push(self, node):
        self._order += 1
        node.order = self._order
        node.parent = self._stack[-1]
        self._stack[-1].children.append(node)
        return node

    def handle_starttag(self, tag, attrs):
        node = self._push(Node(tag=tag, attrs={k: (v or "") for k, v in attrs}))
        if tag not in VOID_ELEMENTS:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._push(Node(tag=tag, attrs={k: (v or "") for k, v in attrs}))

    def handle_endtag(self, tag):
        # close nearest matching open element (tolerant, like html5 parsers)
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                break

    def handle_data(self, data):
        if data:
            self._push(Node(is_text=True, data=data))


def _index_document(root):
    """Post-hoc subtree-end + tag-index computation (generic path for
    DOMs not built by :func:`parse_html`, which maintains both inline).
    Iterative so pathological nesting can't hit the recursion limit."""
    idx = {}
    walk = [root]
    pre = []  # document order
    while walk:
        n = walk.pop()
        pre.append(n)
        if n.children:
            walk.extend(reversed(n.children))
    for n in pre:
        if not n.is_text and n is not root:
            idx.setdefault(n.tag, []).append(n)
    for n in reversed(pre):  # children before parents
        n.end = n.children[-1].end if n.children else n.order
    root.tag_index = idx
    root.text_index = [n for n in pre if n.is_text]
    cidx: dict = {}
    iidx: dict = {}
    for n in pre:
        if n.is_text or n is root:
            continue
        nid = n.attrs.get("id")
        if nid is not None:
            iidx.setdefault(nid, []).append(n)
        for c in n.classes():
            cidx.setdefault(c, []).append(n)
    root.class_index = cidx
    root.id_index = iidx
    return root


def parse_html_stdlib(html):
    """html.parser-backed parse — the semantic reference for
    :func:`parse_html`; kept for the differential parity test."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    b = _DomBuilder()
    b.feed(html)
    b.close()
    return _index_document(b.root)


# -- fast tokenizer ---------------------------------------------------------
# html.parser spends most of extract_page's budget in goahead()/
# parse_starttag(); this tokenizer reproduces its OBSERVABLE behavior
# for the constructs web pages actually contain (start/end tags,
# self-closing, attributes in all three quote forms, charrefs in text
# and attribute values, comments/declarations/PIs dropped, script/style
# raw-text mode, lone '<' emitted as its own text node — the exact
# text-node SPLITS matter because Contents()-based extraction is
# byte-parity-pinned). test_fast_parser_matches_stdlib diffs the two
# DOMs node-for-node over every fixture corpus.

from html import unescape as _unescape  # noqa: E402

_START_RE = re.compile(
    r"<([a-zA-Z][^\t\n\r\f />\x00]*)"  # tag name
    r"((?:\s+[^\s/>=]+(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s>]*))?)*)"  # attrs
    r"\s*(/?)>"
)
_END_RE = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_ATTR_RE = re.compile(
    r"\s*([^\s/>=]+)(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]*)))?"
)
# one double-quoted attribute is the dominant cache-MISS shape (every
# distinct link href misses _ATTRS_CACHE); match it in one shot instead
# of spinning up finditer
_ONE_ATTR_RE = re.compile(r"\s*([^\s/>=]+)\s*=\s*\"([^\"]*)\"\s*$")
_RAWTEXT_END = {
    t: re.compile(r"</\s*" + t, re.IGNORECASE) for t in ("script", "style")
}

# Raw attr-string → parsed dict. Templated pages repeat the same class/
# attr strings on thousands of nodes, so the regex attr parse is paid
# once per distinct string. Parsed dicts are SHARED across nodes with
# identical raw attr text — DOM consumers treat ``attrs`` as read-only
# (nothing in htmlmini/extract mutates them). Bounded for long-running
# executor processes.
_ATTRS_CACHE: dict = {}
_ATTRS_CACHE_MAX = 65536


def parse_html(html):
    """Parse an HTML string (or bytes, UTF-8) into a DOM root node."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    s = html
    root = Node(tag="#document")
    stack = [root]
    order = 0
    tag_index: dict = {}
    root.tag_index = tag_index
    text_index: list = []
    root.text_index = text_index
    class_index: dict = {}
    root.class_index = class_index
    id_index: dict = {}
    root.id_index = id_index

    def push(node):
        # every push() caller in this tokenizer pushes a TEXT node
        # (elements are created inline below), so the text index is
        # maintained here and at the one inlined text site
        nonlocal order
        order += 1
        node.order = order
        node.end = order  # leaves keep this; elements updated at close
        parent = stack[-1]
        node.parent = parent
        parent.children.append(node)
        text_index.append(node)
        return node

    # hoisted bound methods/globals: the loop body runs once per node and
    # LOAD_FAST beats LOAD_GLOBAL/LOAD_METHOD at this call density
    s_find = s.find
    start_match = _START_RE.match
    end_match = _END_RE.match
    attrs_cache_get = _ATTRS_CACHE.get
    tag_index_get = tag_index.get
    text_append = text_index.append
    unescape = _unescape
    NodeC = Node
    node_new = Node.__new__  # hot sites store slots directly, no ctor call

    i, n = 0, len(s)
    while i < n:
        lt = s_find("<", i)
        if lt < 0:
            chunk = s[i:]
            push(NodeC("", None, None, True, unescape(chunk) if "&" in chunk else chunk))
            break
        if lt > i:
            chunk = s[i:lt]
            # inlined push + ctor: text nodes are the most frequent kind
            order += 1
            parent = stack[-1]
            nd = node_new(NodeC)
            nd.tag = ""
            nd.attrs = _EMPTY_ATTRS
            nd.children = _NO_CHILDREN
            nd.parent = parent
            nd.is_text = True
            nd.data = unescape(chunk) if "&" in chunk else chunk
            nd.order = order
            nd.end = order
            parent.children.append(nd)
            text_append(nd)
        nxt = lt + 1
        c = s[nxt] if nxt < n else ""  # 1-char index beats a slice
        if c and (("a" <= c <= "z") or ("A" <= c <= "Z")):
            m = start_match(s, lt)
            if not m:
                push(NodeC("", None, None, True, "<"))
                i = lt + 1
                continue
            tag, raw_attrs, selfclose = m.group(1, 2, 3)
            tag = tag.lower()
            if raw_attrs:
                attrs = attrs_cache_get(raw_attrs)
                if attrs is None:
                    om = _ONE_ATTR_RE.match(raw_attrs)
                    if om is not None:
                        k, v = om.group(1, 2)
                        attrs = {k.lower(): _unescape(v) if "&" in v else v}
                    else:
                        attrs = {}
                        for am in _ATTR_RE.finditer(raw_attrs):
                            v = am.group(2)
                            if v is None:
                                v = am.group(3)
                            if v is None:
                                v = am.group(4)
                            if v is None:
                                v = ""
                            attrs[am.group(1).lower()] = _unescape(v) if "&" in v else v
                    if len(_ATTRS_CACHE) >= _ATTRS_CACHE_MAX:
                        _ATTRS_CACHE.clear()
                    _ATTRS_CACHE[raw_attrs] = attrs
            else:
                attrs = None
            order += 1
            parent = stack[-1]
            node = node_new(NodeC)
            node.tag = tag
            node.attrs = _EMPTY_ATTRS if attrs is None else attrs
            node.children = []
            node.parent = parent
            node.is_text = False
            node.data = ""
            node.order = order
            node.end = order
            parent.children.append(node)
            lst = tag_index_get(tag)
            if lst is None:
                tag_index[tag] = [node]
            else:
                lst.append(node)
            if attrs is not None:
                nid = attrs.get("id")
                if nid is not None:
                    lst = id_index.get(nid)
                    if lst is None:
                        id_index[nid] = [node]
                    else:
                        lst.append(node)
                cv = attrs.get("class")
                if cv:
                    cls = _CLASSES_CACHE.get(cv)
                    if cls is None:
                        if len(_CLASSES_CACHE) >= 4096:
                            _CLASSES_CACHE.clear()
                        cls = _CLASSES_CACHE[cv] = tuple(cv.split())
                    for c in cls:
                        lst = class_index.get(c)
                        if lst is None:
                            class_index[c] = [node]
                        else:
                            lst.append(node)
            self_closing = bool(selfclose)
            i = m.end()
            if tag in _RAWTEXT_END and not self_closing:
                stack.append(node)  # raw text is a CHILD of script/style
                em = _RAWTEXT_END[tag].search(s, i)
                if em is None:
                    break  # unclosed raw text: html.parser drops it
                if em.start() > i:
                    # raw content: charrefs NOT converted
                    push(NodeC("", None, None, True, s[i : em.start()]))
                stack.pop().end = order
                gt = s_find(">", em.start())
                i = n if gt < 0 else gt + 1
            elif tag not in VOID_ELEMENTS and not self_closing:
                stack.append(node)
        elif c == "/":
            m = end_match(s, lt)
            if m:
                tag = m.group(1).lower()
                top = stack[-1]
                if top.tag == tag:  # well-formed HTML: closes the top
                    top.end = order
                    stack.pop()
                else:
                    for k in range(len(stack) - 1, 0, -1):
                        if stack[k].tag == tag:
                            for nd in stack[k:]:
                                nd.end = order
                            del stack[k:]
                            break
                i = m.end()
            else:
                gt = s_find(">", lt)
                if gt < 0:
                    # EOF mid-construct: html.parser emits '<' then the
                    # tail as data — fall through to the text path
                    push(NodeC("", None, None, True, "<"))
                    i = lt + 1
                else:
                    # bogus end tag ('</>', '</ x'): skip to '>'
                    i = gt + 1
        elif c == "!":
            if s.startswith("<!--", lt):
                j = s_find("-->", lt + 4)
            else:
                j = s_find(">", lt)
                j = j - 2 if j >= 0 else j  # normalize: consume j+3 below
            if j < 0:
                push(NodeC("", None, None, True, "<"))
                i = lt + 1
            else:
                i = j + 3
        elif c == "?":
            j = s_find(">", lt)
            if j < 0:
                push(NodeC("", None, None, True, "<"))
                i = lt + 1
            else:
                i = j + 1
        else:
            push(NodeC("", None, None, True, "<"))
            i = lt + 1
    for nd in stack:  # still-open elements (and the root) span to EOF
        nd.end = order
    return root


# ---------------------------------------------------------------------------
# CSS selector subset
# ---------------------------------------------------------------------------

_SIMPLE_RE = re.compile(
    r"""
    (?P<tag>[a-zA-Z][\w-]*|\*)
    | \#(?P<id>[\w-]+)
    | \.(?P<cls>[\w-]+)
    | \[(?P<attr>[\w-]+)(?:(?P<op>\*?=)["'](?P<val>[^"']*)["'])?\]
    """,
    re.X,
)


def _parse_compound(s):
    """Parse one compound selector like ``div.a-section.celwidget[id*="x"]``."""
    out = {"tag": None, "id": None, "classes": [], "attrs": []}
    pos = 0
    while pos < len(s):
        m = _SIMPLE_RE.match(s, pos)
        if not m:
            raise ValueError(f"unsupported selector fragment: {s[pos:]!r} in {s!r}")
        if m.group("tag"):
            out["tag"] = None if m.group("tag") == "*" else m.group("tag").lower()
        elif m.group("id"):
            out["id"] = m.group("id")
        elif m.group("cls"):
            out["classes"].append(m.group("cls"))
        else:
            out["attrs"].append((m.group("attr"), m.group("op"), m.group("val")))
        pos = m.end()
    return out


_COMBINATOR_RE = re.compile(r"\s*([>~+])\s*|\s+")


def _parse_group(group):
    """Parse one comma-free selector into [(combinator, compound), ...].

    The first entry's combinator is ``' '`` (descendant of the context node).
    """
    group = group.strip()
    steps = []
    pos = 0
    comb = " "
    while pos < len(group):
        # read one compound: up to the next combinator at depth 0
        m = _COMBINATOR_RE.search(group, pos)
        # careful: whitespace inside [attr="a b"] — our selectors don't have
        # spaces inside brackets except attr values; guard by bracket depth
        end = len(group)
        depth = 0
        i = pos
        while i < len(group):
            c = group[i]
            if c == "[":
                depth += 1
            elif c == "]":
                depth -= 1
            elif depth == 0 and (c.isspace() or c in ">~+"):
                end = i
                break
            i += 1
        steps.append((comb, _parse_compound(group[pos:end])))
        # consume combinator
        j = end
        comb = " "
        while j < len(group) and (group[j].isspace() or group[j] in ">~+"):
            if group[j] in ">~+":
                comb = group[j]
            j += 1
        pos = j
    return steps


def _parse_selector_uncached(selector):
    groups, depth, start = [], 0, 0
    for i, c in enumerate(selector):
        if c == "[":
            depth += 1
        elif c == "]":
            depth -= 1
        elif c == "," and depth == 0:
            groups.append(selector[start:i])
            start = i + 1
    groups.append(selector[start:])
    return [_parse_group(g) for g in groups if g.strip()]


_SELECTOR_CACHE: dict = {}


def parse_selector(selector):
    """Parse a selector list (comma groups). Bracket-aware comma split.

    Memoized: the extractor uses a fixed, small set of selector strings
    but calls them once per page — re-parsing dominated the profile
    (~20% of extract_page) before caching. Parsed structures are
    treated as immutable by all matchers."""
    cached = _SELECTOR_CACHE.get(selector)
    if cached is None:
        cached = _SELECTOR_CACHE[selector] = _parse_selector_uncached(selector)
    return cached


def _match_compound(node, comp):
    if node.is_text:
        return False
    if comp["tag"] is not None and node.tag != comp["tag"]:
        return False
    if comp["id"] is not None and node.attrs.get("id") != comp["id"]:
        return False
    if comp["classes"]:
        cls = node.classes()  # cached tuple; tiny, linear scan beats set()
        if not all(c in cls for c in comp["classes"]):
            return False
    for attr, op, val in comp["attrs"]:
        if attr not in node.attrs:
            return False
        if op == "=" and node.attrs[attr] != val:
            return False
        if op == "*=" and val not in node.attrs[attr]:
            return False
    return True


def _doc_root(context):
    r = context
    p = r.parent
    while p is not None:
        r = p
        p = r.parent
    return r


def _filter_candidates(cand, comp, check_tag=False):
    """Apply a compound to index candidates. ``check_tag`` is set when
    the candidates came from the class/id index (so the tag part, if
    any, still needs verifying); tag-index candidates skip it."""
    cid, classes, cattrs = comp["id"], comp["classes"], comp["attrs"]
    tag = comp["tag"] if check_tag else None
    if tag is None and cid is None and not classes and not cattrs:
        return list(cand)
    out = []
    for n in cand:
        ok = (tag is None or n.tag == tag) and (cid is None or n.attrs.get("id") == cid)
        if ok and classes:
            cls = n.classes()
            ok = all(c in cls for c in classes)
        if ok and cattrs:
            for attr, op, val in cattrs:
                if (
                    attr not in n.attrs
                    or (op == "=" and n.attrs[attr] != val)
                    or (op == "*=" and val not in n.attrs[attr])
                ):
                    ok = False
                    break
        if ok:
            out.append(n)
    return out


def _subtree_slice(cand, context, root):
    """Candidates (document-ordered) restricted to descendants of context."""
    if context is root:
        return cand
    lo = bisect_right(cand, context.order, key=_NODE_ORDER)
    hi = bisect_right(cand, context.end, key=_NODE_ORDER)
    return cand[lo:hi]


def select(context, selector):
    """All descendants of *context* matching *selector*, document order."""
    groups = selector if isinstance(selector, list) else parse_selector(selector)
    root = _doc_root(context)
    try:
        idx = root.tag_index
    except AttributeError:
        idx = None  # manually assembled tree: subtree-walk paths below
    # fast path: one group of one compound ("div.x", "#id", "a" — the
    # majority of the reference's selectors) is just "any descendant
    # matching the compound"
    if len(groups) == 1 and len(groups[0]) == 1:
        comp = groups[0][0][1]
        tag, cid = comp["tag"], comp["id"]
        if idx is not None:
            # indexed path: start from the most selective index the
            # compound names (id > class > tag) via one dict lookup +
            # binary-searched order interval; no subtree walk
            cand = None
            need_tag = False
            if cid is not None:
                cand = root.id_index.get(cid)
                if cand is None:
                    return []
                need_tag = tag is not None
            elif comp["classes"]:
                for c in comp["classes"]:  # rarest class wins
                    lst = root.class_index.get(c)
                    if lst is None:
                        return []
                    if cand is None or len(lst) < len(cand):
                        cand = lst
                need_tag = tag is not None
            elif tag is not None:
                cand = idx.get(tag)
                if not cand:
                    return []
            if cand is not None:
                return _filter_candidates(
                    _subtree_slice(cand, context, root), comp, need_tag
                )
        # walk fallback — hoist the compound's fields and inline the
        # match: most nodes reject on the tag compare, so the common
        # case is one attribute load + one string compare, no call frame
        classes, cattrs = comp["classes"], comp["attrs"]
        out = []
        stack = list(reversed(context.children))
        while stack:  # inlined iter_subtree: no generator frames
            n = stack.pop()
            if not n.is_text and (tag is None or n.tag == tag):
                ok = cid is None or n.attrs.get("id") == cid
                if ok and classes:
                    cls = n.classes()
                    ok = all(c in cls for c in classes)
                if ok and cattrs:
                    for attr, op, val in cattrs:
                        if (
                            attr not in n.attrs
                            or (op == "=" and n.attrs[attr] != val)
                            or (op == "*=" and val not in n.attrs[attr])
                        ):
                            ok = False
                            break
                if ok:
                    out.append(n)
            if n.children:
                stack.extend(reversed(n.children))
        return out
    # general path (combinators / comma groups): a match's TARGET node
    # always satisfies the group's last compound, so when every last
    # compound names an indexable key (id, class, or tag) the index
    # prunes the candidate set the same way before the ancestor-chain
    # check runs (_match_node_against_group re-verifies the compound)
    if idx is not None:
        cand_lists = []
        for steps in groups:
            comp = steps[-1][1]
            if comp["id"] is not None:
                cand_lists.append(root.id_index.get(comp["id"], ()))
            elif comp["classes"]:
                best = ()
                for k, c in enumerate(comp["classes"]):
                    lst = root.class_index.get(c)
                    if lst is None:
                        best = ()
                        break
                    if k == 0 or len(lst) < len(best):
                        best = lst
                cand_lists.append(best)
            elif comp["tag"] is not None:
                cand_lists.append(idx.get(comp["tag"], ()))
            else:
                cand_lists = None  # bare [attr]/*: no index key
                break
        if cand_lists is not None:
            out, seen = [], set()
            for steps, cand in zip(groups, cand_lists):
                for n in _subtree_slice(cand, context, root):
                    if id(n) not in seen and _match_node_against_group(n, steps, context):
                        seen.add(id(n))
                        out.append(n)
            if len(groups) > 1:
                out.sort(key=_NODE_ORDER)  # restore document order across groups
            return out
    out, seen = [], set()
    for n in context.iter_subtree():
        if n.is_text:
            continue
        for steps in groups:
            if _match_node_against_group(n, steps, context):
                if id(n) not in seen:
                    seen.add(id(n))
                    out.append(n)
                break
    return out


def _match_node_against_group(node, steps, context):
    """Match *node* as the target of the last compound in *steps*."""

    def holds(n, idx):
        _, comp = steps[idx]
        if not _match_compound(n, comp):
            return False
        if idx == 0:
            return _is_descendant(n, context)
        comb = steps[idx][0]
        if comb == " ":
            p = n.parent
            while p is not None:
                if holds(p, idx - 1):
                    return True
                p = p.parent
            return False
        if comb == ">":
            return n.parent is not None and holds(n.parent, idx - 1)
        if comb in "~+":
            if n.parent is None:
                return False
            sibs = [s for s in n.parent.children if not s.is_text]
            k = sibs.index(n)
            if comb == "+":
                return k > 0 and holds(sibs[k - 1], idx - 1)
            return any(holds(sibs[j], idx - 1) for j in range(k))
        return False

    return holds(node, len(steps) - 1)


def _is_descendant(n, context):
    if context.tag == "#document" and context.parent is None:
        return True
    p = n.parent
    while p is not None:
        if p is context:
            return True
        p = p.parent
    return False


def _single_compound(groups):
    """The lone compound of a one-group one-step selector list, else None.

    Covers the majority of the reference's filter selectors; lets the
    Sel filter methods call _match_compound directly instead of paying
    a matches()→any()→genexpr frame chain per candidate node (that
    chain was ~10% of extract_page on realistic pages)."""
    if len(groups) == 1 and len(groups[0]) == 1:
        return groups[0][0][1]
    return None


def matches(node, selector):
    """goquery ``Selection.Is`` for simple selectors (no combinators)."""
    groups = parse_selector(selector)
    for steps in groups:
        if len(steps) == 1 and _match_compound(node, steps[0][1]):
            return True
    return False


# ---------------------------------------------------------------------------
# goquery-like Selection
# ---------------------------------------------------------------------------


class Sel:
    """A goquery-like selection: ordered list of nodes."""

    __slots__ = ("nodes",)

    def __init__(self, nodes=()):
        self.nodes = list(nodes)

    def __len__(self):
        return len(self.nodes)

    def __iter__(self):
        for n in self.nodes:
            yield Sel([n])

    @property
    def node(self):
        return self.nodes[0] if self.nodes else None

    def find(self, selector):
        groups = parse_selector(selector)
        if len(self.nodes) == 1:
            # the extractor's dominant shape: select() already returns
            # unique nodes in document order for ONE context, and always
            # a fresh list — skip the seen-set and the Sel(list) re-copy
            s = Sel.__new__(Sel)
            s.nodes = select(self.nodes[0], groups)
            return s
        out, seen = [], set()
        for n in self.nodes:
            for m in select(n, groups):
                if id(m) not in seen:
                    seen.add(id(m))
                    out.append(m)
        return Sel(out)

    def filter(self, selector):
        comp = _single_compound(parse_selector(selector))
        if comp is not None:
            return Sel([n for n in self.nodes if _match_compound(n, comp)])
        return Sel([n for n in self.nodes if matches(n, selector)])

    def filter_fn(self, fn):
        return Sel([n for i, n in enumerate(self.nodes) if fn(i, n)])

    def children_filtered(self, selector):
        comp = _single_compound(parse_selector(selector))
        out = []
        for n in self.nodes:
            if comp is not None:
                out.extend(c for c in n.children if not c.is_text and _match_compound(c, comp))
            else:
                out.extend(c for c in n.children if not c.is_text and matches(c, selector))
        return Sel(out)

    def contents(self):
        out = []
        for n in self.nodes:
            out.extend(n.children)
        return Sel(out)

    def next(self):
        """Immediate next sibling *element* (goquery Next)."""
        out = []
        for n in self.nodes:
            if n.parent is None:
                continue
            sibs = [s for s in n.parent.children if not s.is_text]
            try:
                k = sibs.index(n)
            except ValueError:
                continue
            if k + 1 < len(sibs):
                out.append(sibs[k + 1])
        return Sel(out)

    def next_all_filtered(self, selector):
        comp = _single_compound(parse_selector(selector))
        out = []
        for n in self.nodes:
            if n.parent is None:
                continue
            # one pass over the parent's children: skip to self, then
            # match following element siblings (no sibs list + index())
            after = False
            for s in n.parent.children:
                if s is n:
                    after = True
                elif after and not s.is_text:
                    if _match_compound(s, comp) if comp is not None else matches(s, selector):
                        out.append(s)
        return Sel(out)

    def parent(self):
        out, seen = [], set()
        for n in self.nodes:
            if n.parent is not None and id(n.parent) not in seen:
                seen.add(id(n.parent))
                out.append(n.parent)
        return Sel(out)

    def text(self):
        return "".join(n.text() for n in self.nodes)

    def attr(self, name, default=""):
        for n in self.nodes:
            if name in n.attrs:
                return n.attrs[name]
        return default

    def has_class(self, cls):
        return any(cls in n.classes() for n in self.nodes)

    def each(self, fn):
        for i, n in enumerate(self.nodes):
            fn(i, Sel([n]))
        return self
