"""HTML boilerplate stripping + DOM text-density main-content heuristics.

The north star (BASELINE.json:6) fuses the OCR kernel with "HTML boilerplate
stripping and DOM text-density heuristics" for ``kind='text'`` spans. This is
a deterministic, dependency-free implementation (regex tokenizer — the
container has no lxml/bs4; the heuristics follow the published
text-density/link-density family of Boilerpipe/jusText):

1. drop <script>/<style>/<template> and comments wholesale;
2. drop classic boilerplate containers (<nav>/<header>/<footer>/<aside>);
3. split what remains into block segments on block-level tags;
4. keep a block iff its text is long enough AND its link density (chars
   inside <a> / total chars) is below 0.5;
5. strip inline tags, unescape entities, collapse whitespace.

Pure str->str so it runs identically in the golden-fixture path and inside
the Arrow-batched pandas UDF (extraction/udfs.py).
"""

from __future__ import annotations

import re

_DROP_WHOLESALE = re.compile(
    r"<(script|style|template)\b[^>]*>.*?</\1\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_DROP_CONTAINERS = re.compile(
    r"<(nav|header|footer|aside)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_BLOCK_SPLIT = re.compile(
    r"</?(?:p|div|li|ul|ol|h[1-6]|table|tr|td|th|section|article|blockquote|pre)\b[^>]*>|<br\s*/?>",
    re.IGNORECASE,
)
_ANCHOR = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)
_TAG = re.compile(r"<[^>]+>")
_WS = re.compile(r"\s+")

_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}

MIN_BLOCK_CHARS = 10
MAX_LINK_DENSITY = 0.5


def _unescape(text: str) -> str:
    for k, v in _ENTITIES.items():
        text = text.replace(k, v)
    return text


def _block_text_and_link_chars(block: str) -> tuple[str, int]:
    link_chars = sum(len(_TAG.sub("", m)) for m in _ANCHOR.findall(block))
    text = _WS.sub(" ", _unescape(_TAG.sub(" ", block))).strip()
    return text, link_chars


def extract_main_text(html: str) -> str:
    """HTML-ish markup -> main content text ('' for empty/boilerplate-only).

    Plain text (no tags) passes through with whitespace normalized, so the
    operator is safe over corpora that mix markup and raw text.
    """
    if html is None:
        return ""
    if "<" not in html:
        return _WS.sub(" ", html).strip()
    s = _DROP_WHOLESALE.sub(" ", html)
    s = _DROP_CONTAINERS.sub(" ", s)
    kept: list[str] = []
    for block in _BLOCK_SPLIT.split(s):
        if not block or not block.strip():
            continue
        text, link_chars = _block_text_and_link_chars(block)
        if len(text) < MIN_BLOCK_CHARS:
            continue
        if link_chars / max(len(text), 1) > MAX_LINK_DENSITY:
            continue
        kept.append(text)
    return "\n".join(kept)
