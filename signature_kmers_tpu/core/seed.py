"""SEED function-string grammar.

Reimplements the semantics of the reference's seed_utils namespace
(ref: seed_utils.h:8-63) on Python's ``re``:

- a function string may carry a trailing comment: ``func  #  comment``
  (whitespace required on both sides of the '#' run);
- a single '#' comment starting with frag/missing/trunc marks a truncated
  protein;
- multi-role functions are split on " / ", " @ " or "; ".
"""

from __future__ import annotations

import re

_SPLIT_FUNC_COMMENT_RE = re.compile(r"(.*?)(?:\s+(\#+)\s+(.*))?\Z", re.DOTALL)
_STRIP_FUNC_COMMENT_RE = re.compile(r"\s*\#.*$", re.DOTALL)
_STRIP_FUNC_RE = re.compile(r"(\s*\#.*$)|(^FIG\d{6}[^:]*:\s*)", re.DOTALL)
_SPLIT_FUNCTION_RE = re.compile(r"\s+[/@]\s+|\s*;\s+")
_IS_FRAGMENT_RE = re.compile(r"^(?:frag|missing|trunc)")


def strip_func(s: str) -> str:
    """Remove trailing '# comment' and leading 'FIG######:' prefixes.

    ref: seed_utils.h:19-22.
    """
    return _STRIP_FUNC_RE.sub("", s)


def strip_func_comment(s: str) -> str:
    """Remove a trailing '# comment'.  ref: seed_utils.h:24-28."""
    return _STRIP_FUNC_COMMENT_RE.sub("", s)


def split_func_comment(s: str) -> tuple[str, str, str]:
    """Split into (function, '#'-separator, comment).

    Mirrors seed_utils::split_func_comment (ref: seed_utils.h:30-43): the
    separator is a run of '#' with whitespace on both sides; absent comment
    yields empty separator and comment strings.
    """
    m = _SPLIT_FUNC_COMMENT_RE.match(s)
    if m is None:  # cannot happen: pattern matches any string
        return s, "", ""
    func, sep, comment = m.group(1), m.group(2), m.group(3)
    return func, sep or "", comment or ""


def is_truncated_comment(s: str) -> bool:
    """ref: seed_utils.h:17,45-48 — comment begins frag/missing/trunc."""
    return _IS_FRAGMENT_RE.search(s) is not None


def roles_of_function(function: str) -> list[str]:
    """Split a (comment-stripped) function into roles.

    ref: seed_utils.h:50-62 — split on " / ", " @ ", or ";<space>" via
    sregex_token_iterator(-1), whose semantics differ from re.split in
    one case: when at least one separator matched, the empty suffix
    after a FINAL separator is not emitted; with no separator at all the
    whole string is one role even when empty.  Leading and interior
    empty tokens are kept.  Cross-validated against the compiled
    reference seed_utils (tests/test_reference_grammar_distance.py).
    """
    stripped = strip_func_comment(function)
    roles = _SPLIT_FUNCTION_RE.split(stripped)
    if len(roles) > 1 and roles[-1] == "":
        roles.pop()
    return roles


def split_literal(s: str, delim: str) -> list[str]:
    """Literal-substring split matching operators.h:80-91 semantics."""
    return s.split(delim)
