"""CI face of scripts/coverage_gap.py (VERDICT r6 stretch #7): the
rotation discipline — every declared query with no driver row anywhere
must sit inside the 50-slot driver window, so the NEXT driver round is
always the one that closes the gap.  Runs the script's own parsers (no
Spark session), so this is milliseconds in CI."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from coverage_gap import declared_queries, driver_rows  # noqa: E402


def test_never_checked_queries_are_inside_the_driver_window():
    declared = declared_queries(REPO)
    seen = driver_rows(REPO)
    never = [q for q in declared if q not in seen]
    window = set(declared[:50])
    outside = [q for q in never if q not in window]
    assert not outside, (
        f"{len(outside)} never-driver-checked queries sit OUTSIDE the "
        f"50-slot window and would stay unchecked: {outside} — repack "
        "the QUERIES order (and tests/test_window_freeze.py)"
    )


def test_registry_and_script_agree_on_declaration_order():
    # the script parses the QUERIES literal textually; a drift between
    # that parse and the live registry would silently break the report
    import __spark_entry__ as em

    assert declared_queries(REPO) == list(em.queries().keys())
