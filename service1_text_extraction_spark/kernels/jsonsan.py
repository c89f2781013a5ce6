r"""Dirty-JSON recovery kernel (reference ``json_utils.py:28-184``).

AI/tool transcript turns carry JSON wrapped in prose, markdown fences,
trailing commas, raw control characters, or stray quotes. The reference
recovers it with a 4-strategy ``parse_ai_response`` plus a
``sanitize_json_string`` repair pass; this module re-expresses those
semantics as a pure-Python kernel that Spark runs Arrow-batched (see
``functions.jsonfuncs``). Strategy ladder (json_utils.py:140-184):

1. ``direct`` — the stripped text itself starts with ``{`` or ``[``;
   parse it (with repair). A direct payload that still fails repair
   does NOT fall through to extraction (mirrors the reference, whose
   ``safe_json_loads`` raise short-circuits the ladder).
2. ``fenced`` — first \`\`\`json (or bare \`\`\`) code block.
   (The reference's strategy 4, an alternative fence pattern, is
   subsumed by this one and by design not re-implemented.)
3. ``bare``  — first non-greedy ``{...}`` / ``[...]`` anywhere.
4. ``none``  — nothing parseable found.

Repair pass (json_utils.py:28-99 semantics, own implementation):
trailing-comma removal, control-character escaping inside string
literals, unescaped inner-quote escaping. Divergence, by design: the
reference escapes single quotes as ``\\'`` (invalid JSON — its repair
can only succeed when that branch never fires); this kernel leaves
single quotes alone, so it strictly repairs more inputs.
"""

from __future__ import annotations

import json
import re

_FENCE_RE = re.compile(r"```(?:json)?\s*(\{.*?\}|\[.*?\])\s*```", re.DOTALL)
_BARE_RE = re.compile(r"(\{.*?\}|\[.*?\])", re.DOTALL)
_TRAILING_COMMA_RE = re.compile(r",(\s*[}\]])")

_CTRL_ESCAPES = {
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\b": "\\b",
    "\f": "\\f",
}


def _escape_in_strings(s: str) -> str:
    """Escape raw control chars inside JSON string literals, and double
    quotes that cannot be closers (next non-space char is not a JSON
    structural char). Single linear scan with an in-string flag — no
    backtracking regex."""
    out: list[str] = []
    in_str = False
    escaped = False
    n = len(s)
    for i, ch in enumerate(s):
        if not in_str:
            if ch == '"':
                in_str = True
            out.append(ch)
            continue
        if escaped:
            out.append(ch)
            escaped = False
            continue
        if ch == "\\":
            out.append(ch)
            escaped = True
            continue
        if ch in _CTRL_ESCAPES:
            out.append(_CTRL_ESCAPES[ch])
            continue
        if ch == '"':
            j = i + 1
            # skip any JSON inter-token whitespace (incl. newlines —
            # pretty-printed objects close values at end of line)
            while j < n and s[j] in " \t\r\n":
                j += 1
            if j >= n or s[j] in ",}]:":
                in_str = False  # a real closing quote
                out.append(ch)
            else:
                out.append('\\"')  # stray quote inside the value
            continue
        out.append(ch)
    return "".join(out)


def sanitize_json_string(s: str) -> str:
    """Repair common AI-JSON defects; returns the input unchanged when
    it already parses."""
    try:
        json.loads(s)
        return s
    except (json.JSONDecodeError, TypeError):
        pass
    fixed = _escape_in_strings(s)
    fixed = _TRAILING_COMMA_RE.sub(r"\1", fixed)
    return fixed


def safe_json_loads(s: str):
    """Parse, repairing on failure. Returns the object or raises."""
    try:
        return json.loads(s)
    except json.JSONDecodeError:
        return json.loads(sanitize_json_string(s))


def parse_ai_response(text: str | None) -> tuple[object | None, str]:
    """4-strategy JSON recovery; returns (parsed_or_None, strategy)."""
    if not text or not text.strip():
        return None, "none"
    stripped = text.strip()
    if stripped[0] in "{[":
        try:
            return safe_json_loads(stripped), "direct"
        except json.JSONDecodeError:
            return None, "none"
    m = _FENCE_RE.search(text)
    if m:
        try:
            return safe_json_loads(m.group(1)), "fenced"
        except json.JSONDecodeError:
            return None, "none"
    m = _BARE_RE.search(text)
    if m:
        try:
            return safe_json_loads(m.group(1)), "bare"
        except json.JSONDecodeError:
            return None, "none"
    return None, "none"
