"""Cohort-list source: named cohort definitions loaded from local paths or
remote URLs (the reference's region-list source, config.py:91-106 — a
built-in list plus `fetch_json(REGIONS_LOCATIONS)` over HTTP, filtered by
specifier prefix at config.py:79-85).

A cohort definition is `{"name": str, "langs": [str, ...] | null}` — the
Region analogue in this engine is a language predicate over the corpus
(plans/config.py `cohort_langs`; null = whole corpus, the reference's
`global` region). Lists are fetched driver-side once per run (they are
grid-planning inputs, like the reference's settings, never per-row data)
and validated before use: a cohort name becomes an artifact directory stem
(plans/grid.py combo_label), so an untrusted remote list must not be able
to inject path separators or relative components.
"""

from __future__ import annotations

import json
import os
import re
import urllib.request

# built-in list: the reference starts REGIONS_LIST with the global region
# (config.py:93) before appending bundled + remote definitions
BUILTIN_COHORTS: list[dict] = [{"name": "global", "langs": None}]

# artifact-path safety: names are embedded in output directory layouts
_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,63}$")


def _is_url(loc: str) -> bool:
    return loc.startswith(("http://", "https://"))


def _fetch_json(loc: str):
    if _is_url(loc):
        with urllib.request.urlopen(loc) as r:
            return json.loads(r.read())
    with open(os.path.expanduser(loc), "rb") as f:
        return json.load(f)


def _validate(entry, loc: str) -> dict:
    if not isinstance(entry, dict) or "name" not in entry:
        raise ValueError(f"cohort entry from {loc!r} must be a dict with 'name'")
    name = entry["name"]
    if not isinstance(name, str) or not _NAME_RE.match(name):
        # reject anything that could escape the artifact directory
        raise ValueError(f"unsafe cohort name {name!r} from {loc!r}")
    langs = entry.get("langs")
    if langs is not None:
        if not isinstance(langs, list) or not all(
            isinstance(x, str) and _NAME_RE.match(x) for x in langs
        ):
            raise ValueError(f"cohort {name!r} from {loc!r}: bad langs list")
        langs = list(langs)
    return {"name": name, "langs": langs}


def fetch_cohorts(locations: list[str] | None) -> list[dict]:
    """Built-in cohorts + every definition fetched from `locations` (local
    paths or http(s) URLs, each a JSON list of cohort dicts). Later
    definitions shadow earlier ones by name (so a remote list can override
    a built-in), mirroring the reference's append-then-prefix-filter order
    (config.py:92-105) with explicit last-wins disambiguation."""
    by_name: dict[str, dict] = {}
    for c in BUILTIN_COHORTS:
        by_name[c["name"]] = dict(c)
    for loc in locations or []:
        data = _fetch_json(loc)
        if not isinstance(data, list):
            raise ValueError(f"cohort list at {loc!r} must be a JSON list")
        for entry in data:
            v = _validate(entry, loc)
            by_name[v["name"]] = v
    return list(by_name.values())


def select_cohorts(cohort_list: list[dict], prefix: str) -> list[dict]:
    """Name-prefix selection (the reference's specifier-prefix filter,
    config.py:79-85: `specifier.startswith(regions_string)`)."""
    return [c for c in cohort_list if c["name"].startswith(prefix)]


def resolve_cohort_tokens(
    tokens: list[str], cohort_list: list[dict]
) -> list[tuple[str | None, tuple[str, ...] | None]]:
    """CLI token → (name, langs-predicate) pairs.

    A token that prefix-matches named cohorts expands to those (one grid
    cell each, labeled by cohort name); otherwise it is an inline
    comma-separated lang list ('en,es', name None → combo_label's joined
    convention), with 'all'/'' meaning the global cohort — the same dual
    convention the reference's --regions flag has (named specifiers or
    nothing for global, config.py:74-89)."""
    out: list[tuple[str | None, tuple[str, ...] | None]] = []
    for tok in tokens:
        if tok in ("all", ""):
            out.append((None, None))
            continue
        named = select_cohorts(cohort_list, tok)
        if named:
            for c in named:
                out.append(
                    (c["name"], tuple(c["langs"]) if c["langs"] else None)
                )
        else:
            out.append((None, tuple(tok.split(","))))
    return out
