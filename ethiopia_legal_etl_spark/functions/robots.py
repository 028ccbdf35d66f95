"""Robots Exclusion Protocol (RFC 9309) parser and matcher — the
crawl-permission gate a 100 TB harvest runs before fetching anything
(complements operators/ingest.polite_fetch_stage, which handles rate;
this handles permission). Dependency-free implementation of the
public spec:

- groups of user-agent lines followed by allow/disallow rules;
  product tokens match case-insensitively; '*' group is the fallback
- rule paths support the two RFC 9309 metacharacters: '*' (any
  substring) and a trailing '$' (end anchor); everything else is
  literal octets
- precedence: the LONGEST matching rule wins (length of the rule
  pattern); on a length tie, allow wins (RFC 9309 section 2.3.2)
- empty disallow ("Disallow:") matches nothing; no matching rule
  means allowed

Parity note: the reference crawls a single known-friendly site and
skips robots entirely; at archive scale the gate is mandatory, so it
is part of the engine's ingest surface.
"""

from __future__ import annotations


def parse_robots(text: str) -> dict[str, list[tuple[bool, str]]]:
    """robots.txt -> {user_agent_lower: [(is_allow, path_pattern)]}.
    Consecutive user-agent lines share the rule group that follows
    (RFC 9309 section 2.2.1)."""
    groups: dict[str, list[tuple[bool, str]]] = {}
    current: list[str] = []
    rules_started = True  # a UA line after rules starts a NEW group
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field, value = field.strip().lower(), value.strip()
        if field == "user-agent":
            if rules_started:
                current = []
                rules_started = False
            agent = value.lower()
            current.append(agent)
            groups.setdefault(agent, [])
        elif field in ("allow", "disallow"):
            rules_started = True
            if not current:
                continue  # rules before any user-agent line: ignored
            if field == "disallow" and value == "":
                continue  # empty disallow matches nothing
            for agent in current:
                groups[agent].append((field == "allow", value))
    return groups


def _greedy_prefix_match(parts: list[str], path: str) -> bool:
    """Match '*'-separated literal parts against path with no end
    anchor: first part is a required prefix, later parts placed
    greedy-leftmost. Complete for unanchored globs (the classic
    argument: sliding a later part left never unblocks an earlier
    one)."""
    pos = 0
    for i, part in enumerate(parts):
        if i == 0:
            if not path.startswith(part):
                return False
            pos = len(part)
        else:
            found = path.find(part, pos)
            if found < 0:
                return False
            pos = found + len(part)
    return True


def _pattern_matches(pattern: str, path: str) -> bool:
    """RFC 9309 path match: literal octets, '*' wildcard, trailing
    '$' anchor. Iterative greedy placement (no regex, so a hostile
    pattern can't blow up the matcher)."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = pattern.split("*")
    if not anchored or parts[-1] == "":
        # unanchored, or the anchor follows a '*' (vacuous: any tail)
        return _greedy_prefix_match(parts[:-1] if parts[-1] == "" and len(parts) > 1 else parts, path)
    # Anchored with a non-empty final literal: that literal must sit
    # exactly at end-of-path. Greedy-LEFTMOST placement of it fails
    # paths where it also occurs earlier ('/*.pdf$' vs '/a.pdf.pdf')
    # and would fail the crawl-permission gate OPEN. Pin the suffix,
    # then match the remaining parts unanchored within what precedes it.
    last = parts[-1]
    if not path.endswith(last):
        return False
    head = path[: len(path) - len(last)]
    if len(parts) == 1:  # no '*' at all: anchored means exact match
        return head == ""
    return _greedy_prefix_match(parts[:-1], head)


def robots_allowed(
    groups: dict[str, list[tuple[bool, str]]], agent: str, path: str
) -> bool:
    """Evaluate RFC 9309 precedence for one URL path: pick the group
    (exact agent, else '*'), find all matching rules, longest pattern
    wins, allow wins ties, no match -> allowed."""
    rules = groups.get(agent.lower())
    if rules is None:
        rules = groups.get("*", [])
    best_len, allowed = -1, True
    for is_allow, pattern in rules:
        if _pattern_matches(pattern, path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and is_allow):
                best_len, allowed = plen, is_allow
    return allowed
