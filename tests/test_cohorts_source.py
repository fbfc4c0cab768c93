"""Cohort-list source: named cohorts from local paths or HTTP URLs (the
reference's remote region list, /root/reference/isimip_qa/config.py:91-106,
with specifier-prefix selection at config.py:79-85)."""

from __future__ import annotations

import http.server
import json
import threading

import pytest

from isimip_qa_spark.plans.grid import plan_grid
from isimip_qa_spark.plans.config import QAConfig
from isimip_qa_spark.sources.cohorts import (
    BUILTIN_COHORTS,
    fetch_cohorts,
    resolve_cohort_tokens,
    select_cohorts,
)

EURO = [
    {"name": "euro-west", "langs": ["en", "fr", "de"]},
    {"name": "euro-south", "langs": ["es"]},
    {"name": "cjk", "langs": ["zh"]},
]


def _write(tmp_path, name, data):
    p = tmp_path / name
    p.write_text(json.dumps(data))
    return str(p)


def test_builtin_only():
    lst = fetch_cohorts(None)
    assert lst == BUILTIN_COHORTS
    assert lst[0] == {"name": "global", "langs": None}


def test_local_file_and_prefix_select(tmp_path):
    loc = _write(tmp_path, "c.json", EURO)
    lst = fetch_cohorts([loc])
    assert {c["name"] for c in lst} == {"global", "euro-west", "euro-south", "cjk"}
    # reference's specifier-prefix filter semantics
    assert {c["name"] for c in select_cohorts(lst, "euro")} == {
        "euro-west", "euro-south"
    }
    assert select_cohorts(lst, "nope") == []


def test_http_fetch_and_shadowing(tmp_path):
    """A remote list is fetched over real HTTP; a later list shadows an
    earlier definition by name (last-wins)."""

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = json.dumps(EURO).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/cohorts.json"
        override = _write(
            tmp_path, "o.json", [{"name": "euro-west", "langs": ["en"]}]
        )
        lst = fetch_cohorts([url, override])
        by = {c["name"]: c for c in lst}
        assert by["euro-west"]["langs"] == ["en"]  # shadowed by later list
        assert by["euro-south"]["langs"] == ["es"]  # from HTTP
    finally:
        srv.shutdown()


@pytest.mark.parametrize(
    "bad",
    [
        [{"langs": ["en"]}],  # no name
        [{"name": "../escape", "langs": ["en"]}],  # path traversal
        [{"name": "a/b", "langs": ["en"]}],  # separator
        [{"name": "ok", "langs": "en"}],  # langs not a list
        [{"name": "ok", "langs": ["en", "../x"]}],  # unsafe lang
        {"name": "ok"},  # not a list
    ],
)
def test_untrusted_list_rejected(tmp_path, bad):
    loc = _write(tmp_path, "bad.json", bad)
    with pytest.raises(ValueError):
        fetch_cohorts([loc])


def test_token_resolution_and_grid_labels(tmp_path):
    loc = _write(tmp_path, "c.json", EURO)
    lst = fetch_cohorts([loc])
    resolved = resolve_cohort_tokens(["euro", "en,es", "all"], lst)
    # 'euro' expands to both named cohorts; inline + all keep name None
    assert resolved == [
        ("euro-west", ("en", "fr", "de")),
        ("euro-south", ("es",)),
        (None, ("en", "es")),
        (None, None),
    ]
    names = [nm for nm, _ in resolved]
    cohorts = [langs for _, langs in resolved]
    combos = plan_grid(QAConfig(), [None], cohorts, names)
    labels = [lbl for lbl, _, _ in combos]
    assert labels == [
        "window=all/cohort=euro-west",
        "window=all/cohort=euro-south",
        "window=all/cohort=en-es",
        "window=all/cohort=global",
    ]
    # named cohorts still get the applicability prune + the langs predicate
    assert all(ok for _, _, ok in combos)
    assert combos[1][1].cohort_langs == ("es",)
