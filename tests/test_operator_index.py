"""OPERATORS.md drift test (the citation-test discipline applied to the
operator index): the committed file must equal a fresh regeneration, so
the index can never rot against the registry, the SURVEY sections, or
the implementation file:line anchors."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_operators_md_matches_regeneration():
    sys.path.insert(0, str(REPO))
    sys.path.insert(0, str(REPO / "tools"))
    import gen_operator_index

    committed = (REPO / "OPERATORS.md").read_text()
    assert committed == gen_operator_index.generate(), (
        "OPERATORS.md is stale — run `python tools/gen_operator_index.py`"
    )


def test_every_query_has_a_survey_home():
    sys.path.insert(0, str(REPO / "tools"))
    import gen_operator_index

    text = gen_operator_index.generate()
    rows = [l for l in text.splitlines() if l.startswith("| ") and "`" in l]
    unmapped = [r for r in rows if "| — |" in r]
    assert len(rows) >= 141
    assert not unmapped, unmapped
