"""Frozen HTML text + href extractor (spec v1).

The reference repo has no HTML/WARC code (SURVEY.md scope note #2), so the
"byte-identical extracted text per url" invariant of BASELINE.json binds to
*this* extractor: it is the in-repo reference implementation, frozen, and
pinned by golden sha256 hashes in tests/test_extract.py. Do not change the
behavior of anything in this file without re-freezing the goldens and
bumping EXTRACTOR_VERSION.

Rules (frozen):
- decode: UTF-8 with ``errors="replace"``.
- parser: stdlib ``html.parser.HTMLParser`` with ``convert_charrefs=True``
  (entities decoded). Lenient: never raises on malformed HTML.
- text: data chunks outside <script>/<style>/<noscript>/<template>, each
  chunk whitespace-collapsed (``" ".join(chunk.split())``), empty chunks
  dropped, joined with a single ``"\\n"``.
- links: every ``<a href=...>``; resolved against the page url with
  ``urllib.parse.urljoin``; fragment dropped; only http/https kept;
  normalized with :func:`normalize_url`.
- url normalization: scheme and host lowercased, default port stripped
  (``:80`` for http, ``:443`` for https), empty path becomes ``/``,
  query kept verbatim, fragment dropped.

This is pure Python (stdlib only) so the byte-for-byte behavior does not
drift with third-party library versions.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin, urlsplit, urlunsplit

EXTRACTOR_VERSION = 1

_SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})
_VOID_TAGS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)
_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def normalize_url(url: str) -> str | None:
    """Normalize an absolute URL per the frozen spec; None if not http(s)."""
    try:
        scheme, netloc, path, query, _frag = urlsplit(url)
    except ValueError:
        return None
    scheme = scheme.lower()
    if scheme not in ("http", "https"):
        return None
    netloc = netloc.lower()
    default = _DEFAULT_PORTS[scheme]
    if netloc.endswith(default):
        netloc = netloc[: -len(default)]
    if not netloc:
        return None
    if not path:
        path = "/"
    return urlunsplit((scheme, netloc, path, query, ""))


class _Extractor(HTMLParser):
    def __init__(self, base_url: str):
        super().__init__(convert_charrefs=True)
        self.base_url = base_url
        self.chunks: list[str] = []
        self.links: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "a":
            for name, value in attrs:
                if name == "href" and value is not None:
                    resolved = urljoin(self.base_url, value)
                    norm = normalize_url(resolved)
                    if norm is not None:
                        self.links.append(norm)
                    break

    def handle_startendtag(self, tag, attrs):
        # <script/> style self-closing tags never push the skip stack
        if tag not in _SKIP_TAGS:
            self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._skip_depth == 0:
            collapsed = " ".join(data.split())
            if collapsed:
                self.chunks.append(collapsed)


def extract(html: bytes | str, base_url: str) -> tuple[str, list[str]]:
    """Extract (text, normalized outgoing http(s) links) from one page.

    Deterministic: same bytes + same base_url -> same output, always.
    Links keep their order of appearance and duplicates (de-dup/weighting
    happens downstream in the edge-building groupby).
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _Extractor(base_url)
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # html.parser is documented lenient; belt-and-braces: a parse
        # explosion yields whatever was extracted so far (deterministic).
        pass
    return "\n".join(parser.chunks), parser.links


def extract_text(html: bytes | str, base_url: str = "http://x.invalid/") -> str:
    return extract(html, base_url)[0]


def extract_links(html: bytes | str, base_url: str) -> list[str]:
    return extract(html, base_url)[1]
