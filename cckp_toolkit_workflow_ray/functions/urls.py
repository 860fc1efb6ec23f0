"""URL canonicalization — zero-copy Arrow RE2 kernels.

The standard web-corpus pre-dedup pass (one crawl sees the same page as
``http://``/``https://``, with/without ``www.``, with tracking params,
trailing slashes, default ports, fragments): canonicalize first, then
exact-dedup on the canonical form.  Reference behavior anchor: the
toolkit's URL-format validation stage
(/root/reference/bin/analyze_joss.py URL checks) normalizes before
comparing; this module is that normalization generalized to the corpus
dedup key.

Every transform is a ``pyarrow.compute`` RE2 kernel, chosen so the SQL
oracle can reproduce it with DuckDB ``regexp_replace(..., 'g')`` —
both engines run RE2, so parity is exact (verified kernel-by-kernel in
tests).  Policy, in order:

1. strip the ``#fragment``;
2. lowercase the ``scheme://host[:port]`` prefix (path/query case is
   significant and preserved);
3. ``http://`` → ``https://`` (scheme-equivalence policy);
4. strip a leading ``www.``;
5. strip the default ports ``:443``/``:80``;
6. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``),
   tidying separators;
7. strip one trailing ``/``.

Query-param ORDER is preserved (sorting params can change semantics on
real sites, so it is deliberately NOT part of the canonical form).
NULL urls stay NULL; non-URL strings pass through untouched (the
never-abort rule — a malformed url is a row to flag, not a crash).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["canonicalize_urls", "url_hosts"]

_TRACKING = r"utm_[A-Za-z0-9_]*|fbclid|gclid"
_SCHEME_HOST = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def canonicalize_urls(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized canonical form of a string url column (see module
    docstring for the exact policy).  Null-safe; never raises on
    malformed input."""
    u = pc.replace_substring_regex(urls, r"#.*$", "")
    pre = pc.struct_field(
        pc.extract_regex(u, rf"^(?P<p>{_SCHEME_HOST[1:]})"), "p")
    rest = pc.replace_substring_regex(u, _SCHEME_HOST, "")
    joined = pc.binary_join_element_wise(pc.utf8_lower(pre), rest, "")
    u = pc.if_else(pc.is_valid(pre), joined, u)
    u = pc.replace_substring_regex(u, r"^http://", "https://")
    u = pc.replace_substring_regex(u, r"^https://www\.", "https://")
    u = pc.replace_substring_regex(
        u, r"^(https://[^/?#:]+):(?:443|80)(/|\?|#|$)", r"\1\2")
    u = pc.replace_substring_regex(u, rf"&(?:{_TRACKING})=[^&]*", "")
    u = pc.replace_substring_regex(u, rf"\?(?:{_TRACKING})=[^&]*&", "?")
    u = pc.replace_substring_regex(u, rf"\?(?:{_TRACKING})=[^&]*$", "")
    return pc.replace_substring_regex(u, r"/$", "")


def url_hosts(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Lowercased host of each url (port stripped); null when the value
    has no ``scheme://host`` shape."""
    h = pc.struct_field(
        pc.extract_regex(urls, r"^[A-Za-z][A-Za-z0-9+.-]*://(?P<h>[^/?#:]+)"),
        "h")
    return pc.utf8_lower(h)
