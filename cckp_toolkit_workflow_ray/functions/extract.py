"""HTML → text extraction (pure, versioned).

The reference's content-acquisition check is "could the record's contents
be obtained and used" (``git clone`` success → PASS at
``/root/reference/modules/ProcessRepo.nf:41-44``).  For a pages table the
equivalent capability is: the ``html`` payload parses and its extracted
text is byte-identical to the stored ``text`` column — the per-row
invariant mandated by BASELINE.json.

``synthesize_html`` and ``extract_text`` are exact inverses for any text
value: paragraphs are the newline-split of ``text``, HTML-escaped, so no
text content can break the markup.  The real-world analog would swap
``extract_text`` for a selectolax/lxml extractor inside the same actor
stage; the engine only depends on the function being pure and versioned.
"""

from __future__ import annotations

import re

EXTRACTOR_VERSION = "1.0.0"

_P_RE = re.compile(rb"<p>(.*?)</p>", re.S)


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _unescape(s: str) -> str:
    return s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")


def synthesize_html(text: str, title: str = "") -> bytes:
    """Render text into a minimal deterministic HTML page (UTF-8 bytes)."""
    paragraphs = "".join(f"<p>{_escape(p)}</p>" for p in text.split("\n"))
    return (
        f'<html><head><meta charset="utf-8"><title>{_escape(title)}</title>'
        f"</head><body>{paragraphs}</body></html>"
    ).encode("utf-8")


def extract_text(html: bytes) -> str:
    """Inverse of :func:`synthesize_html`: recover the exact text payload.

    Raises ``ValueError`` on undecodable bytes; returns whatever paragraphs
    are present otherwise (a corrupted page simply extracts to different
    text, which the extraction-validation check flags as a mismatch).
    """
    body = html.decode("utf-8")  # may raise ValueError/UnicodeDecodeError
    return "\n".join(_unescape(m.decode("utf-8")) for m in _P_RE.findall(html)) if body else ""
