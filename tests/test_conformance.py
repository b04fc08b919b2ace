"""Run every transcribed W3C SPARQL 1.1 conformance case; WRONG = fail.

Regenerate the CONFORMANCE.md scoreboard with
``python scripts/conformance.py`` after adding cases.
"""

from __future__ import annotations

import pytest

from conformance_cases import CASES
from conformance_runner import run_case


@pytest.mark.parametrize(
    "case", CASES, ids=[c["id"] for c in CASES]
)
def test_conformance(spark, case):
    status, detail = run_case(spark, case)
    assert status != "WRONG", f"{case['id']} [{case['section']}]: {detail}"
    if case["kind"] == "reject":
        assert status == "rejected", detail
    else:
        assert status == "green", detail
