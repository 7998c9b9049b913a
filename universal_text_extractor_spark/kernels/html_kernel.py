"""HTML extraction kernel (K1, SURVEY.md §2.3).

Reproduces the *semantics* of the reference HTML extractor
(reference utils/file_handlers.py:926-977) with a hand-rolled tokenizer —
no bs4/lxml, so output bytes depend only on this module (SURVEY.md §7.2):

- title of first ``<title>`` element, ``"Untitled"`` when absent
  (reference :947), prefixed as ``"Title: {title}\\n\\n"`` (reference :962)
- ``<script>``/``<style>`` subtrees removed (reference :951-952)
- all text nodes joined with ``"\\n"`` (bs4 ``get_text(separator='\\n')``,
  reference :955)
- whitespace cleanup: strip lines, split on double-space, drop empties,
  join with ``"\\n"`` (reference :957-960)
- on any kernel error: regex tag-strip floor (reference :966-971) wrapped
  in the error literal semantics of the caller

Additionally implements the north-star main-content mode
(:func:`extract_main_content`): Readability/trafilatura-style boilerplate
removal via per-block text-density and link-density heuristics. This is a
*separate* output (the reference-parity text stays byte-exact).
"""

from __future__ import annotations

import html as _htmllib
import re
from typing import Iterator

# Elements whose content is raw text (never parsed as markup) and which the
# reference strips entirely (reference utils/file_handlers.py:951-952).
_RAWTEXT_STRIP = ("script", "style")
# Elements treated as RCDATA (raw text, entities decoded).
_RCDATA = ("title", "textarea")

_TAG_NAME_RE = re.compile(r"[A-Za-z][-A-Za-z0-9:_]*")
_WS_SPLIT_RE = re.compile(r"\s+")


def _tokenize(src: str) -> Iterator[tuple[str, str]]:
    """Tolerant HTML tokenizer. Never raises on malformed input.

    Yields (kind, data) tuples, kind ∈ 'start' | 'end' | 'text' |
    'startend'. Attributes are scanned (the closing '>' must be found
    with the same quote-aware walk) but never materialized — no consumer
    reads them, and the extraction hot path spends most of its time here
    (SURVEY §8: plain tuples + no per-tag dict ≈ 25% off the HTML
    kernel)."""
    i, n = 0, len(src)
    low: str | None = None  # lazily lowered ONCE for rawtext close scans
    while i < n:
        lt = src.find("<", i)
        if lt < 0:
            if i < n:
                yield ("text", src[i:])
            return
        if lt > i:
            yield ("text", src[i:lt])
        if lt + 1 >= n:
            yield ("text", src[lt:])
            return
        c = src[lt + 1]
        if c == "!":
            if src.startswith("<!--", lt):
                end = src.find("-->", lt + 4)
                i = n if end < 0 else end + 3
            else:  # doctype / bogus declaration
                end = src.find(">", lt)
                i = n if end < 0 else end + 1
            continue
        if c == "?":  # processing instruction
            end = src.find(">", lt)
            i = n if end < 0 else end + 1
            continue
        if c == "/":
            m = _TAG_NAME_RE.match(src, lt + 2)
            end = src.find(">", lt)
            if m is None or end < 0:
                # stray "</" with no tag — emit '<' as text like a browser would
                yield ("text", src[lt])
                i = lt + 1
                continue
            yield ("end", m.group(0).lower())
            i = end + 1
            continue
        m = _TAG_NAME_RE.match(src, lt + 1)
        if m is None:
            yield ("text", src[lt])
            i = lt + 1
            continue
        name = m.group(0).lower()
        # scan to the closing '>', respecting quoted attribute values —
        # same control flow as attribute parsing, minus the storage
        j = m.end()
        while j < n:
            ch = src[j]
            if ch == ">":
                break
            if ch in "\"'":
                q = src.find(ch, j + 1)
                j = n if q < 0 else q + 1
                continue
            if ch.isalpha() or ch == "_":
                am = _TAG_NAME_RE.match(src, j)
                # .group first: byte-identical fallback-log crash parity
                # with the attribute-name read this scan replaced (am is
                # None for non-ASCII "alpha" or '_'-led names; the
                # AttributeError routes to the regex floor, reference
                # :966-971, with the exception text in the logs column)
                am.group(0)
                j = am.end()
                while j < n and src[j] in " \t\r\n":
                    j += 1
                if j < n and src[j] == "=":
                    j += 1
                    while j < n and src[j] in " \t\r\n":
                        j += 1
                    if j < n and src[j] in "\"'":
                        q = src.find(src[j], j + 1)
                        j = n if q < 0 else q + 1
                    else:
                        while j < n and src[j] not in " \t\r\n>":
                            j += 1
                continue
            j += 1
        if j >= n:  # unterminated tag: swallow rest
            yield ("start", name)
            return
        selfclose = src[j - 1] == "/" if j > lt + 1 else False
        yield ("startend" if selfclose else "start", name)
        i = j + 1
        # raw-text element: consume up to the matching close tag verbatim
        if not selfclose and name in _RAWTEXT_STRIP + _RCDATA:
            if low is None:
                low = src.lower()
            close = low.find("</" + name, i)
            raw = src[i:] if close < 0 else src[i:close]
            if name in _RCDATA:
                yield ("text", raw)
            # script/style content is dropped entirely (reference :951-952)
            yield ("end", name)
            if close < 0:
                return
            gt = src.find(">", close)
            i = n if gt < 0 else gt + 1


def _walk(src: str):
    """Yield (title, text_nodes) — text nodes outside script/style, plus the
    first <title> content (RCDATA, entity-decoded)."""
    title: str | None = None
    in_title = 0
    texts: list[str] = []
    unescape = _htmllib.unescape
    append = texts.append
    for kind, data in _tokenize(src):
        if kind == "text":
            decoded = unescape(data)
            if in_title:
                if title is None:
                    title = decoded
            else:
                append(decoded)
        elif kind == "start" and data == "title":
            in_title += 1
        elif kind == "end" and data == "title":
            in_title = max(0, in_title - 1)
    return title, texts


def _cleanup(text: str) -> str:
    """Exact whitespace-chunking of the reference
    (reference utils/file_handlers.py:957-960)."""
    out: list[str] = []
    append = out.append
    for line in text.splitlines():
        for phrase in line.strip().split("  "):
            chunk = phrase.strip()
            if chunk:
                append(chunk)
    return "\n".join(out)


def regex_strip_tags(src: str) -> str:
    """Floor fallback semantics (reference utils/file_handlers.py:966-971)."""
    text = re.sub(r"<[^>]+>", " ", src)
    return re.sub(r"\s+", " ", text).strip()


def extract_html(src: str) -> tuple[str, list[str]]:
    """Reference-parity HTML extraction (utils/file_handlers.py:926-977).

    Returns (text, logs). Never raises.
    """
    logs: list[str] = []
    try:
        logs.append("Extracting text from HTML using DOM tokenizer")
        title, texts = _walk(src)
        if title is None:
            title = "Untitled"  # reference :947
        body = _cleanup("\n".join(texts))
        logs.append("Successfully extracted text from HTML")
        return f"Title: {title}\n\n{body}", logs
    except Exception as e:  # floor fallback, reference :966-971
        logs.append(f"HTML extraction failed: {e}")
        logs.append("Used basic regex for HTML text extraction")
        return regex_strip_tags(src), logs


# --- main-content mode (north-star boilerplate removal) ---------------------

_BOILERPLATE_TAGS = frozenset(("nav", "footer", "header", "aside", "form", "noscript"))
_BLOCK_TAGS = frozenset((
    "p", "div", "section", "article", "main", "li", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre",
))
_MAX_LINK_DENSITY = 0.4
_MIN_BLOCK_CHARS = 25


def extract_main_content(src: str) -> str:
    """Readability-style main-content extraction (north-star extension).

    One pass over the token stream, grouping text into blocks at block-tag
    boundaries. A block is kept iff it is outside nav/footer/header/aside/
    form subtrees, has >= _MIN_BLOCK_CHARS visible characters, and its link
    density (chars inside <a> / total chars) <= _MAX_LINK_DENSITY. Headings
    are always kept when non-empty. Deterministic; locked by goldens.
    """
    boiler_depth = 0
    anchor_depth = 0
    heading_depth = 0
    title_depth = 0
    # (joined_text, total_chars, link_chars, is_heading)
    blocks: list[tuple[str, int, int, bool]] = []
    cur: list[str] = []
    cur_link = 0
    cur_total = 0
    cur_heading = False

    def flush():
        nonlocal cur, cur_link, cur_total, cur_heading
        joined = _cleanup("\n".join(cur))
        if joined:
            blocks.append((joined, cur_total, cur_link, cur_heading))
        cur, cur_link, cur_total, cur_heading = [], 0, 0, False

    for kind, data in _tokenize(src):
        if kind in ("start", "startend"):
            if data == "title":
                title_depth += 1 if kind == "start" else 0
                continue
            if data in _BOILERPLATE_TAGS:
                if kind == "start":
                    boiler_depth += 1
                continue
            if data == "a" and kind == "start":
                anchor_depth += 1
            if data in _BLOCK_TAGS:
                flush()
                if data[0] == "h" and data[1:].isdigit():
                    heading_depth += 1 if kind == "start" else 0
                    cur_heading = True
        elif kind == "end":
            if data == "title":
                title_depth = max(0, title_depth - 1)
                continue
            if data in _BOILERPLATE_TAGS:
                boiler_depth = max(0, boiler_depth - 1)
                continue
            if data == "a":
                anchor_depth = max(0, anchor_depth - 1)
            if data in _BLOCK_TAGS:
                flush()
                if data[0] == "h" and data[1:].isdigit():
                    heading_depth = max(0, heading_depth - 1)
        elif kind == "text":
            if boiler_depth or title_depth:
                continue
            decoded = _htmllib.unescape(data)
            stripped = _WS_SPLIT_RE.sub(" ", decoded).strip()
            if not stripped:
                continue
            cur.append(decoded)
            cur_total += len(stripped)
            if anchor_depth:
                cur_link += len(stripped)
            if heading_depth:
                cur_heading = True
    flush()

    kept: list[str] = []
    for joined, total, link, is_heading in blocks:
        if is_heading and total > 0:
            kept.append(joined)
            continue
        if total < _MIN_BLOCK_CHARS:
            continue
        if total > 0 and link / total > _MAX_LINK_DENSITY:
            continue
        kept.append(joined)
    return "\n".join(kept)
