"""Shared dissect / grok pattern compilers.

ONE compiler serves both surfaces that speak these pattern dialects —
the ingest-pipeline ``dissect`` processor and the ES|QL
``DISSECT``/``GROK`` commands — so the matching rules (whole-string
anchoring, ``%{}``/``%{?name}`` skip refs, modifier rejection, grok
type suffixes) cannot drift between them. Both compile to plain Java
regexes evaluated by ``regexp_extract`` inside whole-stage codegen;
nothing here touches Python at row time.

Dissect semantics (ES): the pattern must cover the WHOLE input
(anchored ``^..$``); each ``%{key}`` captures lazily up to the next
literal separator; the final ref captures greedily to the end;
``->``/``+``/``/`` modifiers are rejected explicitly rather than
silently mis-matched.
"""
from __future__ import annotations

import re

_DISSECT_REF = re.compile(r"%\{([^}]*)\}")

GROK_PATTERNS = {
    "WORD": r"\w+", "NOTSPACE": r"\S+", "SPACE": r"\s+",
    "DATA": r".*?", "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE10NUM": r"[+-]?\d+(?:\.\d+)?",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "HOSTNAME": r"[a-zA-Z0-9.\-]+",
    "TIMESTAMP_ISO8601":
        r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?"
        r"(?:Z|[+-]\d{2}:?\d{2})?",
    "LOGLEVEL":
        r"(?:TRACE|DEBUG|INFO|WARN(?:ING)?|ERROR|FATAL|SEVERE|CRITICAL)",
    "QUOTEDSTRING": r'"[^"]*"',
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
    "POSINT": r"[1-9]\d*",
    "NONNEGINT": r"\d+",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "IPORHOST": r"(?:\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
                r"|[a-zA-Z0-9.\-]+)",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "EMAILADDRESS": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.\-]+",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.@]+))?(?::(\w+))?\}")


def dissect_regex(pattern: str) -> tuple[str, list[str]]:
    """dissect pattern -> (anchored regex, captured field names).
    Supports ``%{name}``, ``%{}`` and ``%{?skipped}``; modifiers
    raise ValueError."""
    out, fields, last = ["^"], [], 0
    refs = list(_DISSECT_REF.finditer(pattern))
    for i, m in enumerate(refs):
        out.append(re.escape(pattern[last:m.start()]))
        key = m.group(1)
        if "->" in key or key.startswith(("+", "/")):
            raise ValueError(
                f"dissect: modifier in %{{{key}}} not supported")
        greedy = i == len(refs) - 1 and m.end() == len(pattern)
        body = r".*" if greedy else r".*?"
        if key and not key.startswith("?"):
            fields.append(key)
            out.append(f"({body})")
        else:
            out.append(f"(?:{body})")
        last = m.end()
    out.append(re.escape(pattern[last:]) + "$")
    return "".join(out), fields


def grok_regex(pattern: str) -> tuple[str, list[tuple[str, str]]]:
    """grok pattern -> (regex, [(name, type)]). Unanchored (grok
    matches anywhere, per ES); unknown %{BASE} raises ValueError."""
    out, fields, last = [], [], 0
    for m in _GROK_REF.finditer(pattern):
        out.append(re.escape(pattern[last:m.start()]))
        base, name, ftype = m.group(1), m.group(2), m.group(3)
        if base not in GROK_PATTERNS:
            raise ValueError(f"grok: unknown pattern %{{{base}}}")
        if name:
            fields.append((name, ftype or "string"))
            out.append(f"({GROK_PATTERNS[base]})")
        else:
            out.append(f"(?:{GROK_PATTERNS[base]})")
        last = m.end()
    out.append(re.escape(pattern[last:]))
    return "".join(out), fields
