"""Record-keeping guards: README/BASELINE headline numbers must track the
latest driver benchmark artifact (VERDICT r1 item 8 / r2 weak #1 — the
headline went stale two rounds running; this test makes that impossible
to miss)."""

import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_bench():
    rounds = []
    for name in os.listdir(REPO):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", name)
        if m:
            rounds.append((int(m.group(1)), name))
    if not rounds:
        pytest.skip("no BENCH_r*.json artifact")
    _, name = max(rounds)
    with open(os.path.join(REPO, name)) as f:
        data = json.load(f)
    parsed = data.get("parsed") or data
    return name, float(parsed["value"]), float(parsed["vs_baseline"])


def test_readme_headline_matches_latest_bench():
    name, value, _ = _latest_bench()
    with open(os.path.join(REPO, "README.md")) as f:
        readme = f.read()
    m = re.search(r"\*\*Headline:\*\*\s+([\d.]+)M primary rays/s", readme)
    assert m, "README.md must state an 'N.NM primary rays/s' headline"
    claimed = float(m.group(1)) * 1e6
    # +-10% tolerance (tightened r5 after a one-round-stale headline
    # slipped through the old +-20% band): absorbs run-to-run bench
    # variance without letting a stale headline survive a round.
    assert abs(claimed - value) <= 0.10 * value, (
        f"README headline {claimed:.3g} rays/s is stale vs {name} "
        f"({value:.3g} rays/s) — refresh README.md and BASELINE.md"
    )


def test_baseline_md_has_latest_bench_row():
    name, value, vs = _latest_bench()
    with open(os.path.join(REPO, "BASELINE.md")) as f:
        base = f.read()
    rows = re.findall(r"([\d.]+)M\s*\|\s*([\d.]+)x", base)
    assert rows, "BASELINE.md must tabulate measured rays/s rows"
    best = max(float(v) * 1e6 for v, _ in rows)
    assert abs(best - value) <= 0.10 * value, (
        f"BASELINE.md best row {best:.3g} rays/s is stale vs {name} "
        f"({value:.3g} rays/s) — add the current measurement"
    )
