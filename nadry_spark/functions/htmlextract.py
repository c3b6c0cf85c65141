"""HTML extraction — reference semantics F1-F4 on stdlib html.parser.

Reproduces search-engin/src/main/java/indexer/DocumentProcessor.java:
- title / meta[name=description] extraction (:55-59)
- link extraction + URL normalization BEFORE unwanted-node removal
  (:61-63, 165-210)
- removal of ``script, .ads, .comments`` (:23-25)
- extractMainContent (:124-149): text of the FIRST of
  ``main, article, div[class*=content], div[id*=content]`` PLUS the text
  of ALL of a long selector list, space-joined then trimmed — the
  deliberate duplication is part of the indexed-content semantics.
- docId = lowercase-hex SHA-256 of the url (:151-163).

Faithfulness notes:

* The Java URL normalizer (:182-205) lowercases the whole url and then
  collapses ``/+`` to ``/`` **except after the literal "https:"**
  (regex ``(?<!https:)/+``). ``http://x`` therefore becomes ``http:/x``
  which fails the later ``startsWith("http://")`` check in extractLinks
  (:171) — i.e. the reference only ever keeps https links. Reproduced.
* ``text()`` follows Jsoup's whitespace normalization (collapse runs,
  space at block-element boundaries, ``pre`` preserved). The pinned
  goldens in tests/ freeze this behaviour; the synthetic corpus derives
  its ``text`` column from this extractor so the per-url byte-identity
  invariant is closed over our own spec.
* Links are returned as a sorted list (the reference keeps a HashSet,
  i.e. unordered — sorting is the deterministic canonical form).
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from functools import lru_cache
from html.parser import HTMLParser
from urllib.parse import urljoin

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Jsoup's default block tags (Tag.java blockTags)
BLOCK_TAGS = frozenset(
    (
        "html head body frameset script noscript style meta link title frame noframes "
        "section nav aside hgroup header footer p h1 h2 h3 h4 h5 h6 ul ol pre div "
        "blockquote hr address figure figcaption form fieldset ins del dl dt dd li "
        "table caption thead tfoot tbody colgroup col tr th td video audio canvas "
        "details menu plaintext template article main svg math center dir applet "
        "marquee listing"
    ).split()
)

EXTRA_SECTION_TAGS = frozenset(
    (
        "article section header footer main h1 h2 h3 h4 h5 h6 p blockquote pre "
        "li dt dd strong em cite q time code span"
    ).split()
)

_WS_RUN = re.compile(r"\s+")


@dataclass
class Element:
    tag: str
    attrs: dict[str, str]
    children: list = field(default_factory=list)  # Element | str (text node)
    parent: "Element | None" = None

    def classes(self) -> set[str]:
        return set(self.attrs.get("class", "").split())

    def iter(self):
        """Document-order traversal including self."""
        yield self
        for child in self.children:
            if isinstance(child, Element):
                yield from child.iter()

    def text(self) -> str:
        """Jsoup-style normalized text of this subtree."""
        parts: list[str] = []
        self._text_into(parts, in_pre=False)
        return "".join(parts).strip()

    def _text_into(self, acc: list[str], in_pre: bool) -> None:
        in_pre = in_pre or self.tag == "pre"
        for child in self.children:
            if isinstance(child, Element):
                if acc and (child.tag in BLOCK_TAGS or child.tag == "br"):
                    if not acc[-1].endswith(" "):
                        acc.append(" ")
                child._text_into(acc, in_pre)
                # jsoup tail rule: block element followed by a text node
                if child.tag in BLOCK_TAGS and acc and not acc[-1].endswith(" "):
                    acc.append(" ")
            else:
                if in_pre:
                    acc.append(child)
                else:
                    strip_leading = not acc or acc[-1].endswith(" ")
                    norm = _WS_RUN.sub(" ", child)
                    if strip_leading:
                        norm = norm.lstrip(" ")
                    if norm:
                        acc.append(norm)


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("#root", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        adict: dict[str, str] = {}
        for k, v in attrs:
            if k not in adict:  # first duplicate attribute wins (Jsoup)
                adict[k] = v if v is not None else ""
        el = Element(tag, adict, parent=self.stack[-1])
        self.stack[-1].children.append(el)
        if tag not in VOID_TAGS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        adict: dict[str, str] = {}
        for k, v in attrs:
            if k not in adict:
                adict[k] = v if v is not None else ""
        self.stack[-1].children.append(Element(tag, adict, parent=self.stack[-1]))

    def handle_endtag(self, tag):
        # close the nearest matching open tag; ignore strays
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html: str) -> Element:
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


# ---------------------------------------------------------------------------
# URL normalization — DocumentProcessor.normalizeUrl (:182-205)
# ---------------------------------------------------------------------------

_SLASH_COLLAPSE = re.compile(r"(?<!https:)/+")
# characters java.net.URI rejects unescaped (others array + control + space)
_URI_ILLEGAL = re.compile(r'[\x00-\x20"<>{}|\\^`\x7f-\U0010ffff]', re.ASCII)


def _remove_dot_segments(path: str) -> str:
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
        else:
            out.append(seg)
    if path.endswith(("/.", "/..")):
        out.append("")
    return "/".join(out)


def normalize_url(url: str | None, base_url: str) -> str | None:
    """Reference normalizeUrl: resolve vs base, strip #fragment, lowercase,
    collapse ``/+`` except after ``https:``, sort query params, validate.

    Memoized on (url, base_url): pure function, and absolute hrefs (the
    common case on the web — nav/footer links repeat across pages)
    resolve identically under any base, so the per-worker cache hits
    across documents. urljoin/urlparse dominate the cost otherwise.
    Oversized hrefs (data:/javascript: payloads on hostile pages)
    bypass the cache so the LRU cannot pin large keys in worker
    memory: 512-char cutoff x 32Ki entries bounds the worst-case
    cache footprint at ~32 MB of key strings per Python worker (real
    nav/footer hrefs are far shorter, so the hit rate is unaffected)."""
    if url is None or not url.strip():
        return None
    if len(url) > 512 or len(base_url) > 512:
        return _normalize_url_cached.__wrapped__(url, base_url)
    return _normalize_url_cached(url, base_url)


@lru_cache(maxsize=1 << 15)
def _normalize_url_cached(url: str, base_url: str) -> str | None:
    try:
        encoded = url.replace(" ", "%20").replace("|", "%7C")
        absolute = urljoin(base_url, encoded)
        # java URI.normalize(): remove dot segments from the path
        scheme_sep = absolute.find("://")
        if scheme_sep != -1:
            rest = absolute[scheme_sep + 3 :]
            slash = rest.find("/")
            if slash != -1:
                tail = rest[slash:]
                qpos = len(tail)
                for c in ("?", "#"):
                    p = tail.find(c)
                    if p != -1:
                        qpos = min(qpos, p)
                path, suffix = tail[:qpos], tail[qpos:]
                absolute = (
                    absolute[: scheme_sep + 3] + rest[:slash] + _remove_dot_segments(path) + suffix
                )
        normalized = absolute
        if "#" in normalized:
            normalized = normalized[: normalized.index("#")]
        normalized = normalized.lower()
        normalized = _SLASH_COLLAPSE.sub("/", normalized)
        if "?" in normalized:
            base_part, query = normalized.split("?", 1)
            params = sorted(p for p in query.split("&") if p)
            normalized = base_part + ("?" + "&".join(params) if params else "")
        # java: new URL(normalized).toURI() — reject illegal characters /
        # unknown protocols
        if _URI_ILLEGAL.search(normalized):
            return None
        if not normalized.startswith(("http:", "https:", "ftp:", "file:", "jar:")):
            return None
        return normalized
    except ValueError:
        return None


def extract_links(root: Element, base_url: str) -> set[str]:
    """extractLinks (:165-178): a[href] -> normalize -> keep http(s) only.

    Because of the slash-collapse quirk only https:// survives in practice.
    """
    links: set[str] = set()
    for el in root.iter():
        if el.tag == "a" and "href" in el.attrs:
            normalized = normalize_url(el.attrs["href"], base_url)
            if normalized and (
                normalized.startswith("http://") or normalized.startswith("https://")
            ):
                links.add(normalized)
    return links


def extract_anchor_links(html: str | None, base_url: str) -> list[tuple[str, str]]:
    """(normalized_target, anchor_text) for every a[href] that survives
    the http(s) filter — ADDITIVE to the reference surface (the
    reference's extractLinks keeps only the deduplicated href set;
    nadry/.../DocumentProcessor.java:165-178 discards the element
    text). Anchor text is the inbound-link description signal a
    web-scale indexer aggregates per TARGET page, so unlike
    :func:`extract_links` this keeps one row per occurrence (the same
    target linked twice with different text is two signals) and does
    not dedup. Empty/oversized pages return [] (same skip rule as
    process_document)."""
    if html is None or not html.strip():
        return []
    if len(html.encode("utf-8")) > 100_000_000:
        return []
    root = parse_html(html)
    out: list[tuple[str, str]] = []
    for el in root.iter():
        if el.tag == "a" and "href" in el.attrs:
            normalized = normalize_url(el.attrs["href"], base_url)
            if normalized and (
                normalized.startswith("http://") or normalized.startswith("https://")
            ):
                out.append((normalized, el.text()))
    return out


# ---------------------------------------------------------------------------
# Unwanted-node removal + main-content extraction
# ---------------------------------------------------------------------------


def remove_unwanted(root: Element, selectors=("script", ".ads", ".comments")) -> None:
    """doc.select("script, .ads, .comments").remove() (:23-25, 61-63)."""
    tag_sels = {s for s in selectors if not s.startswith(".")}
    class_sels = {s[1:] for s in selectors if s.startswith(".")}

    def prune(el: Element) -> None:
        kept = []
        for child in el.children:
            if isinstance(child, Element):
                if child.tag in tag_sels or (class_sels & child.classes()):
                    continue
                prune(child)
            kept.append(child)
        el.children = kept

    prune(root)


def _select_first_content(root: Element) -> Element | None:
    """selectFirst("main, article, div[class*=content], div[id*=content]")."""
    for el in root.iter():
        if el.tag in ("main", "article"):
            return el
        if el.tag == "div":
            if "content" in el.attrs.get("class", "").lower():
                return el
            if "content" in el.attrs.get("id", "").lower():
                return el
    return None


def extract_main_content(root: Element) -> str:
    """extractMainContent (:124-149) — duplication included by design."""
    parts: list[str] = []
    main = _select_first_content(root)
    if main is not None:
        parts.append(main.text())
        parts.append(" ")
    for el in root.iter():
        if el.tag in EXTRA_SECTION_TAGS or (el.tag == "a" and "href" in el.attrs):
            parts.append(el.text())
            parts.append(" ")
    content = "".join(parts).strip()
    if not content:
        body = next((e for e in root.iter() if e.tag == "body"), None)
        content = body.text() if body is not None else ""
    return content


def generate_doc_id(url: str) -> str:
    """SHA-256 lowercase hex of the url (:151-163)."""
    return hashlib.sha256(url.encode("utf-8")).hexdigest()


def extract_title(root: Element) -> str:
    for el in root.iter():
        if el.tag == "title":
            return el.text()
    return ""


def extract_description(root: Element) -> str:
    for el in root.iter():
        if el.tag == "meta" and el.attrs.get("name", "").lower() == "description":
            return el.attrs.get("content", "")
    return ""


def process_document(html: str | None, url: str) -> dict | None:
    """Full DocumentProcessor.process for one page (:42-77).

    Returns dict(doc_id, url, title, description, content, links) or None
    for skipped documents (empty / oversized html).
    """
    if html is None or not html.strip():
        return None
    if len(html.encode("utf-8")) > 100_000_000:
        return None
    root = parse_html(html)
    title = extract_title(root)
    description = extract_description(root)
    links = extract_links(root, url)
    remove_unwanted(root)
    content = extract_main_content(root)
    return {
        "doc_id": generate_doc_id(url),
        "url": url,
        "title": title,
        "description": description,
        "content": content,
        "links": sorted(links),
    }
