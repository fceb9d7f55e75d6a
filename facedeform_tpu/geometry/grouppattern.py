"""Houdini group-pattern strings -> boolean point masks.

The reference binds its `group` parameter through `cookInputGroups`
(src/SOP_FaceDeform.cpp:119-120, 156-173), which accepts full Houdini
group syntax — not just a single named group.  This module implements the
point-group subset of that grammar over Mesh.point_groups:

    token        meaning
    -----        -------
    name         named point group (KeyError if absent and not a pattern)
    na*e / n?me  glob over group names (union of all matches)
    !name        complement of a named group / glob union
    7            a single point number
    3-40         inclusive point-number range
    3-40:2       every 2nd point of the range (Houdini step syntax)
    3-40:2,5     keep the first 2 of every 5 (Houdini keep,of syntax)

Whitespace-separated tokens are unioned left to right; a `^` prefix
subtracts the token's set from the selection accumulated so far (the
Houdini idiom `* ^fixed`).  A pattern of only `^`/`!` tokens starts from
the empty set, matching GOP's semantics.
"""

from __future__ import annotations

import fnmatch
import re

import numpy as np

_RANGE_RE = re.compile(
    r"^(\d+)(?:-(\d+)(?::(\d+)(?:,(\d+))?)?)?$"
)


def _token_mask(tok: str, mesh) -> np.ndarray:
    """One token (no ^/! prefix) -> boolean mask."""
    v = mesh.num_points
    m = _RANGE_RE.match(tok)
    if m:
        lo = int(m.group(1))
        hi = int(m.group(2)) if m.group(2) is not None else lo
        if lo > hi:
            lo, hi = hi, lo
        lo, hi = min(lo, v), min(hi, v - 1)
        mask = np.zeros(v, bool)
        if m.group(3) is None:
            mask[lo : hi + 1] = True
        elif m.group(4) is None:
            # a-b:step — every step-th point of the range
            step = max(int(m.group(3)), 1)
            mask[lo : hi + 1 : step] = True
        else:
            # a-b:keep,of — the first `keep` of every `of` points
            keep, of = int(m.group(3)), max(int(m.group(4)), 1)
            rel = np.arange(hi + 1 - lo) % of < keep
            mask[lo : hi + 1] = rel
        return mask
    if tok == "*":
        # Houdini: `*` selects every point, grouped or not (the idiom
        # `* ^fixed` depends on this), NOT the union of group names.
        return np.ones(v, bool)
    if any(c in tok for c in "*?["):
        names = sorted(n for n in mesh.point_groups if fnmatch.fnmatchcase(n, tok))
        mask = np.zeros(v, bool)
        for n in names:
            mask |= mesh.point_groups[n].astype(bool)
        return mask
    return mesh.group_mask(tok).astype(bool)


def parse_group_pattern(pattern: str, mesh) -> np.ndarray:
    """Resolve a Houdini-style group pattern to a (V,) boolean mask.

    Raises ValueError on an empty/blank pattern and KeyError (with the
    known group names) when a plain token names no group — same contract
    as Mesh.group_mask.
    """
    toks = pattern.split()
    if not toks:
        raise ValueError("empty group pattern")
    sel = np.zeros(mesh.num_points, bool)
    for tok in toks:
        if tok.startswith("^"):
            sel &= ~_token_mask(tok[1:], mesh)
        elif tok.startswith("!"):
            sel |= ~_token_mask(tok[1:], mesh)
        else:
            sel |= _token_mask(tok, mesh)
    return sel
