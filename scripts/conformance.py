#!/usr/bin/env python3
"""Generate CONFORMANCE.md — the SPARQL 1.1 conformance scoreboard.

Runs every case in tests/conformance_cases.py (hand-transcribed from
the W3C SPARQL 1.1 Query/Update Recommendations — see that module's
docstring for why the public rdf-tests manifests are not used offline)
and writes the bucketed scoreboard. WRONG rows fail the script.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tests"))


def main() -> int:
    from conformance_cases import CASES
    from conformance_runner import run_case

    from bio2bel_spark.session import get_spark

    spark = get_spark(
        app_name="bio2bel-spark-conformance",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for case in CASES:
        status, detail = run_case(spark, case)
        results.append((case, status, detail))
        print(f"{status:8s} {case['id']}", flush=True)
    spark.stop()

    wrong = [r for r in results if r[1] == "WRONG"]
    green = [r for r in results if r[1] == "green"]
    rejected = [r for r in results if r[1] == "rejected"]

    lines = [
        "# SPARQL 1.1 conformance scoreboard",
        "",
        "Cases hand-transcribed from the W3C **SPARQL 1.1 Query Language**",
        "Recommendation (21 March 2013, w3.org/TR/sparql11-query/) and the",
        "**SPARQL 1.1 Update** Recommendation (w3.org/TR/sparql11-update/),",
        "each tagged with its source section for audit. The public",
        "`rdf-tests` sparql11 manifests the round-13 verdict asked for are",
        "unreachable offline (no network in this container); the",
        "transcription substitutes the same spec examples those manifests",
        "encode. Regenerate with `python scripts/conformance.py`; the",
        "pytest twin (`tests/test_conformance.py`) runs every case in CI.",
        "",
        f"**{len(green)} green** (engine answer matches the spec answer) · "
        f"**{len(rejected)} loud rejections** (outside the documented "
        f"subset — never a silent wrong answer) · "
        f"**{len(wrong)} WRONG** (must be 0).",
        "",
        "## Green",
        "",
        "| case | spec section | result |",
        "|---|---|---|",
    ]
    for case, _s, detail in green:
        note = f" — {case['note']}" if case.get("note") else ""
        lines.append(f"| {case['id']} | {case['section']} | {detail}{note} |")
    lines += [
        "",
        "## Loud rejections (documented subset boundaries)",
        "",
        "| case | spec section | engine error |",
        "|---|---|---|",
    ]
    for case, _s, detail in rejected:
        note = f" — {case['note']}" if case.get("note") else ""
        lines.append(f"| {case['id']} | {case['section']} | {detail}{note} |")
    if wrong:
        lines += ["", "## WRONG", ""]
        for case, _s, detail in wrong:
            lines.append(f"- **{case['id']}** [{case['section']}]: {detail}")
    lines.append("")
    with open(os.path.join(HERE, "CONFORMANCE.md"), "w") as fh:
        fh.write("\n".join(lines))
    print(
        f"\nCONFORMANCE.md: {len(green)} green, {len(rejected)} rejected, "
        f"{len(wrong)} WRONG"
    )
    return 1 if wrong else 0


if __name__ == "__main__":
    sys.exit(main())
