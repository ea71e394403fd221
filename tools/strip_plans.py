#!/usr/bin/env python3
"""Shrink committed .explain("formatted")-style executed-plan dumps:
drop every "== Initial Plan ==" block (the final AQE plan is the
evidence; the initial plan doubles the text), keeping tree structure
intact. Usage: strip_plans.py <file>... (in place)."""
import sys, re

def depth(line: str) -> int:
    # visual depth = index of first non-tree character
    i = 0
    while i < len(line) and line[i] in ' :+-*(':
        i += 1
    return i

def strip(text: str) -> str:
    out, skip_to = [], None
    for line in text.splitlines():
        if skip_to is not None:
            # stay in skip mode while the line is deeper than the marker
            if line.strip() and depth(line) > skip_to:
                continue
            skip_to = None
        m = re.match(r'^(\s*)\+- == Initial Plan ==\s*$', line)
        if m:
            skip_to = len(m.group(1))
            continue
        out.append(line)
    return '\n'.join(out) + '\n'

for p in sys.argv[1:]:
    t = open(p).read()
    s = strip(t)
    open(p, 'w').write(s)
    print(f"{p}: {len(t)} -> {len(s)} bytes")
