#!/usr/bin/env python3
"""Redact LEAKCHECK.json hit strings in place (round 16, VERDICT r15
item 2).

Each round's leak scan quotes matching lines from git history
verbatim; because LEAKCHECK.json itself is committed, every round's
file re-quotes the previous round's hits as fresh `GITLOG:+` lines
and n_hits grows geometrically even though the working tree has been
clean for 8+ rounds (every hit is the one historical package-mirror
hostname line, re-escaped at nesting depth 1-7).

Fix: replace every hit string with `sha256:<first 16 hex> len=<n>` —
enough to prove two rounds saw the same line (stable hash) without
the committed artifact containing the matched pattern itself. The
scanner records ADDED diff lines only, so once the committed file
carries hashes, subsequent scans find no new quotable text and
n_hits becomes monotonically non-increasing.

Usage: python3 scripts/leak_redact.py [LEAKCHECK.json]
Idempotent: already-redacted entries (sha256:... form) pass through.
"""
import hashlib
import json
import re
import sys

REDACTED = re.compile(r"^sha256:[0-9a-f]{16} len=\d+$")


def redact(s: str) -> str:
    if REDACTED.match(s):
        return s
    h = hashlib.sha256(s.encode("utf-8")).hexdigest()[:16]
    return f"sha256:{h} len={len(s)}"


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "LEAKCHECK.json"
    with open(path) as f:
        doc = json.load(f)
    hits = doc.get("hits", {})
    n = 0
    for cat, lines in hits.items():
        if isinstance(lines, list):
            hits[cat] = [redact(x) if isinstance(x, str) else x
                         for x in lines]
            n += sum(1 for x in lines
                     if isinstance(x, str) and not REDACTED.match(x))
    doc["redacted"] = True
    with open(path, "w") as f:
        json.dump(doc, f, indent=2, sort_keys=False)
        f.write("\n")
    print(f"redacted {n} hit strings in {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
