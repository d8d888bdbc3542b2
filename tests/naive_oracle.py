"""Independent pure-Python oracle for the normalization invariant.

Deliberately a DIFFERENT algorithm from tapes_spark.functions.normalize
(innermost-first regex removal vs. the engine's outermost scanning) so the
pytest equality check is a real cross-implementation test, mirroring the
reference's clone-equivalence goldens (pkg/derive/clone_equivalence_test.go).
"""

from __future__ import annotations

import re

from tapes_spark.functions.normalize import CONTENT_BEARING_TAGS, TAG_CATALOG

_TAG_ALT = "|".join(re.escape(t) for t in TAG_CATALOG)
# innermost complete span: no nested open tag of ANY cataloged kind inside
_INNERMOST = re.compile(
    r"<(" + _TAG_ALT + r")(?:\s[^>]*)?>"
    r"((?:(?!<(?:" + _TAG_ALT + r")(?:\s[^>]*)?>).)*?)"
    r"</\1>",
    re.DOTALL,
)
_ANY_OPEN = re.compile(r"<(" + _TAG_ALT + r")(?:\s[^>]*)?>")


def naive_strip(s: str, keep: frozenset[str] = frozenset()) -> str:
    while True:
        m = _INNERMOST.search(s)
        if m is None:
            break
        replacement = m.group(2) if m.group(1) in keep else ""
        s = s[: m.start()] + replacement + s[m.end() :]
    # unterminated open tags: keep-tags drop just the marker, others swallow
    while True:
        m = _ANY_OPEN.search(s)
        if m is None:
            break
        if m.group(1) in keep:
            s = s[: m.start()] + s[m.end() :]
        else:
            s = s[: m.start()]
    return s


def naive_whitespace(s: str) -> str:
    s = s.replace("\r\n", "\n")
    s = re.sub(r"[ \t]+\n", "\n", s)
    s = re.sub(r"\n{2,}", "\n", s)
    return s.strip(" \t\r\n")


def naive_normalize(s: str) -> str:
    return naive_whitespace(naive_strip(s))


def naive_preview(s: str) -> str:
    return naive_whitespace(naive_strip(s, CONTENT_BEARING_TAGS))
