"""Pin the doc-number checker (VERDICT r12 Next #3): the committed docs'
tagged sections must grep clean against their artifacts, and the tool
must actually catch a planted drift."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import doccheck  # noqa: E402


def test_committed_docs_grep_clean():
    total, misses = 0, []
    for name in doccheck.DOCS:
        n, m = doccheck.check_doc(doccheck.REPO / name)
        total += n
        misses.extend(m)
    assert total > 50  # the tagged sections are non-trivially covered
    assert misses == []


def test_planted_drift_is_caught(tmp_path, monkeypatch):
    art = tmp_path / "FAKE_BENCH.json"
    art.write_text(json.dumps({"q": {"median": 3.881, "runs": [1.81, 8.617]}}))
    doc = tmp_path / "DOC.md"
    doc.write_text(
        "<!-- doccheck: FAKE_BENCH.json -->\n"
        "walls 1.8 -> 3.9 -> 8.6 s, but the drifted 4.8 s is wrong\n"
        "approx ~9.9 s is exempt; config 1024 <!-- unpinned --> skipped\n"
        "<!-- doccheck:end -->\n"
    )
    monkeypatch.setattr(doccheck, "REPO", tmp_path)
    n, misses = doccheck.check_doc(doc)
    assert n == 4  # 1.8, 3.9, 8.6, 4.8 checked; ~9.9 and 1024 skipped
    assert [m["token"] for m in misses] == ["4.8"]


def test_missing_artifact_is_a_failure(tmp_path, monkeypatch):
    doc = tmp_path / "DOC.md"
    doc.write_text("<!-- doccheck: NOT_THERE.json -->\n1.23 s\n")
    monkeypatch.setattr(doccheck, "REPO", tmp_path)
    _, misses = doccheck.check_doc(doc)
    assert misses and misses[0]["artifacts"] == ["NOT_THERE.json"]


def test_planted_census_drift_is_caught(tmp_path, monkeypatch):
    """VERDICT r13 Next #4: census counts are small integers the <1000
    skip used to hide; any integer attached to a census word must be
    checked against the artifact regardless of magnitude."""
    art = tmp_path / "FAKE_SF1.json"
    art.write_text(json.dumps(
        {"census": {"n_measured": 106, "n_exempt": 91,
                    "n_undispositioned": 0}}
    ))
    doc = tmp_path / "DOC.md"
    doc.write_text(
        "<!-- doccheck: FAKE_SF1.json -->\n"
        "census 106 measured / 89 exempt / 0 undispositioned\n"
        "<!-- doccheck:end -->\n"
    )
    monkeypatch.setattr(doccheck, "REPO", tmp_path)
    n, misses = doccheck.check_doc(doc)
    assert [m["token"] for m in misses] == ["89 exempt"]  # the r13 drift
    # and the corrected line is clean
    doc.write_text(
        "<!-- doccheck: FAKE_SF1.json -->\n"
        "census 106 measured / 91 exempt / 0 undispositioned\n"
        "<!-- doccheck:end -->\n"
    )
    n, misses = doccheck.check_doc(doc)
    assert misses == [] and n == 3
