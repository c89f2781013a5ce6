"""HTML main-content extraction kernel (from scratch).

The reference service only processes PDFs; its analogous quality logic
is the garbage gate + header/footer filter
(``core_pdf_processor.py:584-648``, ``text_utils.py:149-166``). For
HTML-fragment turns the north-star requires a Boilerpipe/Readability-
style pass: tokenize -> block segmentation -> per-block text-density /
link-density scoring -> boilerplate drop -> tag strip + unicode clean +
whitespace normalization, emitting text plus char-span offsets.

Design (original, no external parser):

- A single regex scanner yields comments, raw-text elements
  (script/style), tags, and text runs; malformed ``<`` falls back to
  text.
- Block-level tags flush the current text block; a stack of counters
  tracks "drop containers" (script/style/nav/footer/header/aside/...)
  and anchor depth for link-char accounting.
- A block is kept iff it is outside every drop container, has text,
  has link density <= LINK_DENSITY_MAX, and does not look like a page
  header/footer line (reuses the ``text_utils.py:149-166`` patterns).
- Block text is entity-decoded, ``clean_unicode``-cleaned
  (``text_utils.py:16-75`` semantics) and whitespace-normalized
  (``text_utils.py:142-147``); kept blocks join with a blank line.
"""

from __future__ import annotations

import html as _htmlmod
import re
from dataclasses import dataclass, field

from . import textnorm

# Elements whose entire subtree is boilerplate by construction.
DROP_CONTAINERS = frozenset(
    "script style noscript template nav footer header aside form button "
    "select option iframe svg canvas figure figcaption".split()
)

# Tags that terminate the current text block.
BLOCK_TAGS = frozenset(
    "p div section article main h1 h2 h3 h4 h5 h6 li ul ol dl dt dd "
    "table thead tbody tr td th blockquote pre hr br address center "
    "nav footer header aside form fieldset legend details summary "
    "body html head title".split()
)

HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6 title".split())
LIST_TAGS = frozenset("li dt dd".split())

LINK_DENSITY_MAX = 0.33
# text-density gate (applies only to short fragmented blocks so ordinary
# short prose is never dropped): a block with <= MAX_SOUP_WORDS words,
# >= MIN_SOUP_TAGS inline tags, and density below TEXT_DENSITY_MIN is
# markup soup (icon rows, share widgets), not content
TEXT_DENSITY_MIN = 12.0
MAX_SOUP_WORDS = 4
MIN_SOUP_TAGS = 2

_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_RAWTEXT_RE = re.compile(
    r"<(script|style|textarea)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_CDATA_RE = re.compile(r"<!\[CDATA\[.*?\]\]>", re.DOTALL)
# cheap presence probe for the rawtext sweep (case-insensitive opener)
_RAWTEXT_HINT_RE = re.compile(r"<(?:script|style|textarea)\b", re.IGNORECASE)
_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9:-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>")
_DOCTYPE_RE = re.compile(r"<![^>]*>")


@dataclass
class Block:
    """One candidate content block."""

    kind: str = "para"
    pieces: list[tuple[str, bool]] = field(default_factory=list)  # (raw, in_link)
    n_inline_tags: int = 0  # markup fragmentation inside the block

    def raw_chars(self) -> int:
        return sum(len(t) for t, _ in self.pieces)

    def link_chars(self) -> int:
        return sum(len(t) for t, in_link in self.pieces if in_link)

    def text_density(self) -> float:
        """Boilerpipe-style density: content chars per markup unit —
        widget/navigation soup fragments text across many inline tags,
        prose does not."""
        return self.raw_chars() / (1.0 + self.n_inline_tags)


@dataclass
class HtmlResult:
    text: str
    spans: list[tuple[int, int, str]]
    boilerplate_ratio: float


def _kind_for(tag: str) -> str:
    if tag in HEADING_TAGS:
        return "heading"
    if tag in LIST_TAGS:
        return "list"
    if tag == "pre":
        return "pre"
    return "para"


def _looks_like_header_footer(line: str) -> bool:
    """Single-line block filter, reference patterns text_utils.py:154-163."""
    return (
        textnorm._PAGE_LINE_RE.match(line) is not None
        or textnorm._NUM_LINE_RE.match(line) is not None
        or len(line) < 3
        or textnorm._RULE_LINE_RE.match(line) is not None
    )


def _decode_text(raw: str) -> str:
    """Entity decode -> unicode clean -> whitespace normalize."""
    return textnorm.normalize_whitespace(
        textnorm.clean_unicode(_htmlmod.unescape(raw))
    )


def extract_html(payload: str) -> HtmlResult:
    """Extract main content from an HTML fragment or document.

    Returns the kept text (blocks joined by a blank line), per-block
    char spans into that text, and the boilerplate ratio
    (dropped raw text chars / total raw text chars; 0.0 if no text).
    """
    # marker pre-checks: each sub is a full scan even on no match, and
    # most real fragments carry none of these constructs
    src = _COMMENT_RE.sub(" ", payload) if "<!--" in payload else payload
    if _RAWTEXT_HINT_RE.search(src) is not None:
        src = _RAWTEXT_RE.sub(" ", src)
    if "<![CDATA[" in src:
        src = _CDATA_RE.sub(" ", src)  # before DOCTYPE
    if "<!" in src:
        src = _DOCTYPE_RE.sub(" ", src)

    blocks: list[Block] = []
    dropped_raw: list[str] = []
    cur = Block()
    drop_depth = 0
    link_depth = 0
    pending_kind = "para"

    def flush() -> None:
        nonlocal cur
        if cur.pieces:
            blocks.append(cur)
        cur = Block(kind=pending_kind)

    pos = 0
    for m in _TAG_RE.finditer(src):
        if m.start() > pos:
            text = src[pos : m.start()]
            if text.strip():
                if drop_depth == 0:
                    cur.pieces.append((text, link_depth > 0))
                else:
                    # dropped-container text still counts toward the
                    # boilerplate denominator
                    dropped_raw.append(text)
        pos = m.end()

        slash, tag = m.group(1, 2)
        closing, tag = slash == "/", tag.lower()
        if tag in DROP_CONTAINERS:
            flush()
            if closing:
                drop_depth = max(0, drop_depth - 1)
            else:
                # void-ish containers (no close tag seen) are handled by
                # max(0, ...) on the close side; self-closing resets here
                if m.group(0).rstrip(">").endswith("/"):
                    pass
                else:
                    drop_depth += 1
            continue
        if tag == "a":
            if closing:
                link_depth = max(0, link_depth - 1)
            else:
                link_depth += 1
            continue
        if tag in BLOCK_TAGS:
            pending_kind = _kind_for(tag) if not closing else "para"
            flush()
            continue
        # any other (inline) tag fragments the current block
        if drop_depth == 0:
            cur.n_inline_tags += 1

    if pos < len(src) and src[pos:].strip():
        if drop_depth == 0:
            cur.pieces.append((src[pos:], link_depth > 0))
        else:
            dropped_raw.append(src[pos:])
    flush()

    # ---- score + assemble -------------------------------------------------
    kept_texts: list[tuple[str, str]] = []  # (text, kind)
    total_raw = sum(len(t.strip()) for t in dropped_raw)
    kept_raw = 0
    for b in blocks:
        raw = b.raw_chars()
        raw_stripped = sum(len(t.strip()) for t, _ in b.pieces)
        total_raw += raw_stripped
        if raw == 0:
            continue
        link_density = b.link_chars() / raw
        text = _decode_text("".join(t for t, _ in b.pieces))
        if not text:
            continue
        if link_density > LINK_DENSITY_MAX:
            continue
        if (
            len(text.split()) <= MAX_SOUP_WORDS
            and b.n_inline_tags >= MIN_SOUP_TAGS
            and b.text_density() < TEXT_DENSITY_MIN
        ):
            continue
        if _looks_like_header_footer(text):
            continue
        kept_texts.append((text, b.kind))
        kept_raw += raw_stripped

    out_parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    offset = 0
    for i, (text, kind) in enumerate(kept_texts):
        if i:
            out_parts.append("\n\n")
            offset += 2
        spans.append((offset, offset + len(text), kind))
        out_parts.append(text)
        offset += len(text)

    ratio = 1.0 - (kept_raw / total_raw) if total_raw > 0 else 0.0
    return HtmlResult("".join(out_parts), spans, ratio)
