"""BENCH/BASELINE.md appendix plumbing (scripts/benchdoc.py): sections
survive a full bench_scaling-style rewrite and update idempotently —
round 3 lost the promised ANN-crossover table to exactly this rewrite."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import benchdoc


def test_set_section_idempotent_and_reattach(tmp_path):
    base = str(tmp_path / "BASELINE.md")
    with open(base, "w") as f:
        f.write("# headline\n\nmain body v1\n")

    benchdoc.set_section("ann-crossover", "## table v1\n| a | 1 |", baseline_path=base)
    benchdoc.set_section("sf-scaling", "## growth v1", baseline_path=base)
    text = open(base).read()
    assert "table v1" in text and "growth v1" in text and "main body v1" in text

    # updating a section replaces in place (no duplicate markers)
    benchdoc.set_section("ann-crossover", "## table v2\n| a | 2 |", baseline_path=base)
    text = open(base).read()
    assert "table v2" in text and "table v1" not in text
    assert text.count("<!-- ann-crossover:start -->") == 1

    # a wholesale rewrite (bench_scaling) drops both sections...
    with open(base, "w") as f:
        f.write("# headline\n\nmain body v2 (rewritten)\n")
    assert "table v2" not in open(base).read()
    # ...and reattach restores them from the sidecars
    benchdoc.reattach_sections(baseline_path=base)
    text = open(base).read()
    assert "main body v2" in text and "table v2" in text and "growth v1" in text
    # reattach is itself idempotent
    benchdoc.reattach_sections(baseline_path=base)
    assert open(base).read().count("<!-- sf-scaling:start -->") == 1
