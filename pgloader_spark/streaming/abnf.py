"""ABNF scanner-grammar compilation for ``LOAD MESSAGES``.

The reference wires its syslog scanners through the cl-abnf library
(``src/parsers/command-syslog.lisp:48-60``: a scanner like
``apache = rsyslog`` bases on a named ABNF grammar and overrides
productions — ``DATA = IP REST``, ``IP = 1*3DIGIT "." ...``,
``REST = ~/.*/``).  This module compiles that DSL subset to ONE Java-
compatible regex per scanner with plain capturing groups, tracking
rule-name -> group-index so ``REGISTERING timestamp, ip, rest``
projects columns via ``regexp_extract`` (JVM-side, codegen'd).

Supported ABNF elements (the reference corpus' surface):
- rule references by name (case-insensitive, ``-`` allowed)
- quoted string literals
- repetition ``1*3DIGIT`` / ``*DIGIT`` / ``4DIGIT``
- regex literals ``~/.../``
- RFC 5234 core rules (DIGIT ALPHA SP WSP HEXDIG VCHAR)

Base grammar ``rsyslog`` (the RFC3164-ish shape pgloader's sample
config and test/parse/messages.load target):
``[<PRI>] TIMESTAMP HOSTNAME APP-NAME[PROCID]: DATA``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# RFC 5234 core rules (lowercased keys; lookups case-fold)
CORE_RULES = {
    "digit": "[0-9]",
    "alpha": "[A-Za-z]",
    "sp": " ",
    "wsp": "[ \\t]",
    "hexdig": "[0-9A-Fa-f]",
    "vchar": "[\\x21-\\x7e]",
}

# productions of the built-in rsyslog base grammar
RSYSLOG_RULES = {
    "pri": r"<\d+>",
    "timestamp": r"[A-Z][a-z]{2}\s+\d+\s+\d{2}:\d{2}:\d{2}",
    "hostname": r"\S+",
    "app-name": r"[^:\[\s]+",
    "procid": r"\d+",
    "data": r".*",
}

# the rsyslog-msg frame: which base rules appear, in order, and how
# they are glued.  Each entry is (rule-name | literal-regex, wrapper)
# where wrapper contains %s for the (possibly captured) rule body.
_RSYSLOG_FRAME = [
    ("pri", r"(?:%s\s*)?"),
    ("timestamp", "%s"),
    (None, r"\s+"),
    ("hostname", "%s"),
    (None, r"\s+"),
    ("app-name", "%s"),
    ("procid", r"(?:\[%s\])?"),
    (None, r":\s*"),
    ("data", "%s"),
]


class AbnfError(ValueError):
    pass


@dataclass
class CompiledScanner:
    name: str
    base: str
    regex: str  # Java-compatible, plain capturing groups
    groups: dict[str, int] = field(default_factory=dict)  # rule -> group ix


_REP_RE = re.compile(r"^(\d*)\*(\d*)$|^(\d+)$")


def _parse_block(text: str):
    """``name = base [RULE = element...]...`` -> (name, base, rules).

    Rules map lowercase rule name -> list of element tokens."""
    toks = text.split()
    if len(toks) < 3 or toks[1] != "=":
        raise AbnfError(f"bad scanner grammar block: {text!r}")
    name, base = toks[0], toks[2]
    rules: dict[str, list[str]] = {}
    i = 3
    cur: str | None = None
    while i < len(toks):
        if i + 1 < len(toks) and toks[i + 1] == "=":
            cur = toks[i].lower()
            rules[cur] = []
            i += 2
            continue
        if cur is None:
            raise AbnfError(f"element before any rule in {text!r}")
        rules[cur].append(toks[i])
        i += 1
    return name, base.lower(), rules


class _Compiler:
    def __init__(self, user_rules: dict[str, list[str]]):
        self.user_rules = user_rules
        self.groups: dict[str, int] = {}
        self.counter = 0

    def rule_body(self, name: str) -> str:
        """Uncaptured body of a rule (user override wins, then base,
        then core)."""
        key = name.lower()
        if key in self.user_rules:
            return self.elements(self.user_rules[key])
        if key in RSYSLOG_RULES:
            return RSYSLOG_RULES[key]
        if key in CORE_RULES:
            return CORE_RULES[key]
        raise AbnfError(f"unknown ABNF rule {name!r}")

    def rule_ref(self, name: str, capture: bool = True) -> str:
        key = name.lower()
        if capture and key not in self.groups and key not in CORE_RULES:
            # reserve the index BEFORE compiling the body: this
            # rule's '(' opens ahead of any nested captures
            self.counter += 1
            self.groups[key] = self.counter
            return f"({self.rule_body(key)})"
        return f"(?:{self.rule_body(key)})"

    def elements(self, toks: list[str]) -> str:
        out: list[str] = []
        i = 0
        while i < len(toks):
            t = toks[i]
            if t.startswith('"') and t.endswith('"') and len(t) >= 2:
                out.append(re.escape(t[1:-1]))
            elif t.startswith("~/") and t.endswith("/"):
                out.append(f"(?:{t[2:-1]})")
            else:
                rep = re.match(
                    r"^(\d*)\*(\d*)([A-Za-z][\w-]*)$|^(\d+)([A-Za-z][\w-]*)$", t
                )
                if rep:
                    if rep.group(3):  # n*m form
                        lo = rep.group(1) or "0"
                        hi = rep.group(2) or ""
                        body = self.rule_ref(rep.group(3), capture=False)
                        out.append(f"{body}{{{lo},{hi}}}")
                    else:  # exact count
                        body = self.rule_ref(rep.group(5), capture=False)
                        out.append(f"{body}{{{rep.group(4)}}}")
                else:
                    out.append(self.rule_ref(t))
            i += 1
        return "".join(out)


def compile_scanner(block_text: str) -> CompiledScanner:
    """One WITH grammar block -> a full-message regex with group map."""
    name, base, rules = _parse_block(block_text)
    if base not in ("rsyslog", "syslog"):
        raise AbnfError(f"unsupported base grammar {base!r}")
    c = _Compiler(rules)
    parts: list[str] = ["^"]
    for rule, wrapper in _RSYSLOG_FRAME:
        if rule is None:
            parts.append(wrapper)
        else:
            parts.append(wrapper % c.rule_ref(rule))
    parts.append("$")
    return CompiledScanner(
        name=name, base=base, regex="".join(parts), groups=c.groups
    )
